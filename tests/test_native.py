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


@pytest.mark.parametrize("ploidy,beam_width", [(3, 13), (4, 7)])
def test_native_baseline_faithful_deep_coverage_exact(lib, ploidy,
                                                      beam_width):
    """Deep-coverage, non-default-width exactness pin (600 reads on 8
    SNPs, mixed phred weights, full-precision epsilon). Round 4 found
    two faithful-baseline exactness bugs that only surfaced in this
    regime: f32 FlatHap counts rounding per-site sums past 24 mantissa
    bits, and epsilon narrowing to f32 at the C ABI. The end-to-end
    regression pin for those is the fuzz seed-19 case
    (test_pipeline_fuzz.py); this adds a direct native-vs-oracle check
    in the same regime."""
    import oracle

    rng = np.random.default_rng(1234 + ploidy)
    R, S = 600, 8
    eps = 0.029343605990619144
    alleles = np.full((1, R, S), -1, dtype=np.int8)
    weights = np.zeros((1, R, S), dtype=np.float32)
    truth = rng.integers(0, 2, (3, S))
    for r in range(R):
        k = r % 3
        span = sorted(rng.choice(S, size=int(rng.integers(2, S + 1)),
                                 replace=False))
        lo, hi = span[0], span[-1]
        for c in range(lo, hi + 1):
            a = int(truth[k, c])
            if rng.random() < 0.03:
                a = 1 - a
            alleles[0, r, c] = a
            q = int(rng.integers(13, 41))
            weights[0, r, c] = np.float32(
                1.0 - np.float32(10.0) ** (np.float32(q) /
                                           np.float32(-10.0)))
    # canonical read order: (first asc, last desc, index asc)
    first = np.argmax(alleles[0] >= 0, axis=1)
    last = S - 1 - np.argmax(alleles[0, :, ::-1] >= 0, axis=1)
    order = np.lexsort((np.arange(R), -last, first))
    alleles[0] = alleles[0][order]
    weights[0] = weights[0][order]
    asg = native.baseline_sweep(alleles, weights, [ploidy], beam_width,
                                eps, faithful=True, want_assign=True)
    reads = _workload_reads(alleles, weights, 0)
    want = oracle.beam_search(reads, ploidy, eps, beam_width=beam_width)
    assert list(asg[0]) == list(want)


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


def test_native_realign_jobs_matches_numpy(lib):
    """floria_realign_jobs == add_jobs_bulk's numpy mask/pack/lookup
    path, including record-edge and contig-edge bounds drops."""
    from floria_tpu.kernels.realign import _ENC, _OFFSETS, _pack4

    rng = np.random.default_rng(7)
    FLANK = 16
    n_rec, n_snp, ref_len = 40, 30, 5000
    lens = rng.integers(1, 200, n_rec)  # some records shorter than W
    pay_offs = np.zeros(n_rec + 1, np.int64)
    np.cumsum(lens, out=pay_offs[1:])
    seq = rng.integers(0, 256, int(pay_offs[-1])).astype(np.uint8)
    genome_pos = np.sort(rng.choice(ref_len + 40, n_snp,
                                    replace=False)).astype(np.int64)
    n_alleles = rng.integers(1, 5, n_snp).astype(np.int64)
    n_sites = 500
    rec = np.sort(rng.integers(0, n_rec, n_sites)).astype(np.int32)
    qpos = np.array([rng.integers(0, lens[r]) for r in rec], np.int32)
    snp = rng.integers(0, n_snp, n_sites).astype(np.int32)

    res = native.realign_jobs(seq, rec, qpos, snp, pay_offs, genome_pos,
                              ref_len, n_alleles, FLANK, tab_base=3)
    assert res is not None
    kept, packed, si, nal, snp_kept, rec_counts = res
    assert (rec_counts == np.bincount(rec[kept],
                                      minlength=n_rec)).all()

    qpos_global = qpos.astype(np.int64) + pay_offs[rec]
    gn = genome_pos[snp]
    ok = ((gn >= FLANK) & (gn + FLANK < ref_len) & (qpos >= FLANK)
          & (qpos_global + FLANK < pay_offs[rec + 1]))
    assert (kept == ok).all()
    assert (si == 3 + snp[ok].astype(np.int64)).all()
    assert (nal == n_alleles[snp[ok]]).all()
    assert (snp_kept == snp[ok] + 1).all()
    qsel = qpos_global[ok]
    want = _pack4(_ENC[seq[qsel[:, None] + _OFFSETS]])
    assert (packed == want).all()
