"""Native (C++) component tests: BGZF inflate and the simplex flow
solver, validated against the Python/scipy paths."""

import numpy as np
import pytest

from floria_tpu import native
from floria_tpu.graph import flow
from floria_tpu.ingest import bgzf


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_bgzf_matches_python(lib):
    payload = bytes(range(256)) * 4096
    comp = bgzf.compress(payload)
    out = native.bgzf_inflate(comp)
    assert out == payload


def _workload_reads(alleles, weights, g):
    reads = []
    for r in range(alleles.shape[1]):
        cols = np.nonzero(alleles[g, r] >= 0)[0]
        reads.append({int(c): (int(alleles[g, r, c]),
                               float(weights[g, r, c])) for c in cols})
    return reads


@pytest.mark.parametrize("ploidy,seed", [(2, 0), (3, 1), (4, 2)])
def test_native_baseline_faithful_matches_oracle_exactly(lib, ploidy,
                                                         seed):
    """The faithful C++ baseline (hashmap haplotypes, truncation, heap
    dedup — native/baseline.cpp) must reproduce the exact oracle
    assignment read-for-read, not just co-clustering."""
    import oracle

    from bench import make_workload

    G, R, S = 2, 48, 96
    alleles, weights, _, _ = make_workload(G, R, S, seed=seed)
    asg = native.baseline_sweep(alleles, weights, [ploidy], 10, 0.02,
                                faithful=True, want_assign=True)
    for g in range(G):
        reads = _workload_reads(alleles, weights, g)
        want = oracle.beam_search(reads, ploidy, 0.02, beam_width=10)
        assert list(asg[g]) == list(want), (g, ploidy, seed)


def test_native_baseline_dense_matches_oracle_mec(lib):
    """The dense (generous) baseline skips dedup, so assignments may
    diverge on exact-duplicate beams; its MEC must still match the
    oracle's on typical instances."""
    import oracle

    from bench import make_workload

    G, R, S = 2, 48, 96
    alleles, weights, _, _ = make_workload(G, R, S, seed=3)
    asg = native.baseline_sweep(alleles, weights, [3], 10, 0.02,
                                want_assign=True)
    for g in range(G):
        reads = _workload_reads(alleles, weights, g)
        want = oracle.beam_search(reads, 3, 0.02, beam_width=10)

        def mec_of(a):
            haps = oracle.hap_from_partition(reads, list(a), 3, True)
            return sum(e for _b, e in oracle.mec_stats_epsilon(haps,
                                                               0.02))

        assert mec_of(asg[g]) == pytest.approx(mec_of(want), rel=1e-6)


def test_native_flow_matches_scipy(lib):
    rng = np.random.default_rng(0)
    # Random small layered flow problem: 3 columns x 2 rows, full bipartite
    # edges between adjacent columns.
    E = 8
    ae = rng.uniform(1.0, 20.0, E)
    # conservation at the 2 middle nodes: edges 0..3 in (col0->col1),
    # 4..7 out (col1->col2); node (1,r) has in edges {r, r+2}, out {4+2r,
    # 5+2r}.
    rows = []
    for r in range(2):
        row = np.zeros(E)
        row[r] = 1.0
        row[r + 2] = 1.0
        row[4 + 2 * r] = -1.0
        row[5 + 2 * r] = -1.0
        rows.append(row)
    x_scipy = flow._solve(ae, rows)
    x_native = native.solve_flow(ae, rows)
    assert x_native is not None

    def objective(x):
        return np.abs(x - ae).sum()

    # Optima may differ (degenerate LPs); objectives must match.
    assert objective(x_native) == pytest.approx(objective(x_scipy),
                                                abs=1e-6)
    for row in rows:
        assert abs(row @ x_native) < 1e-6
