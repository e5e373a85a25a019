"""Kernel tests: scores, distances, MEC stats, beam search vs the exact
host oracle, UPEM refinement."""

import math

import numpy as np
import pytest

import oracle
from floria_tpu import constants
from floria_tpu.frag import Frag
from floria_tpu.kernels import beam as beam_kernel
from floria_tpu.kernels.blocktensor import (pack_block, partition_counts,
                                            partition_cover)
from floria_tpu.kernels.scores import (binom_tail_jnp, binom_tail_np,
                                       log_sum_exp_np)
from floria_tpu.kernels.stats import (distance_matrix_eps,
                                      distance_read_hap_eps,
                                      mec_stats_epsilon)
from floria_tpu.kernels.upem import optimize_clustering
from floria_tpu.options import Options
from floria_tpu.phase.local import pick_best_ploidy, phase_instances


def test_binom_tail_matches_oracle():
    cases = [(10, 2, 0.05, 0.25), (10.9, 2.7, 0.05, 0.25), (0, 0, 0.1, 1.0),
             (5, 5, 0.02, 0.25), (7, 0, 0.02, 0.25), (100, 3, 0.01, 0.25)]
    for n, k, p, d in cases:
        got = float(binom_tail_np(n, k, p, d))
        want = oracle.binom_tail(n, k, p, d)
        assert got == pytest.approx(want, rel=1e-9), (n, k, p, d)
        got32 = float(binom_tail_jnp(float(n), float(k), p, d))
        assert got32 == pytest.approx(want, rel=1e-4)


def test_log_sum_exp():
    xs = np.array([-700.0, -701.0, -702.0])
    got = float(log_sum_exp_np(xs))
    m = xs.max()
    want = m + math.log(np.exp(xs - m).sum())
    assert got == pytest.approx(want)


def _mk_frag(counter, sites):
    f = Frag(f"r{counter}", counter, False)
    for snp, (allele, qual) in sites.items():
        f.add_site(snp, allele, qual, 0, 0)
    f.freeze()
    return f


def _random_frags(rng, num_reads, num_snps, ploidy, eps=0.03,
                  span=12) -> list:
    strains = rng.integers(0, 2, (ploidy, num_snps))
    frags = []
    for i in range(num_reads):
        k = rng.integers(0, ploidy)
        start = int(rng.integers(1, max(2, num_snps - span)))
        end = min(num_snps, start + span)
        sites = {}
        for snp in range(start, end + 1):
            allele = int(strains[k, snp - 1])
            if rng.random() < eps:
                allele = 1 - allele
            qual = int(rng.integers(10, 40))
            sites[snp] = (allele, qual)
        frags.append(_mk_frag(i, sites))
    frags.sort(key=Frag.sort_key)
    for i, f in enumerate(frags):
        f.counter_id = i
    return frags


def test_distance_eps_matches_oracle():
    rng = np.random.default_rng(0)
    frags = _random_frags(rng, 40, 30, 2)
    bt = pack_block(frags, (1, 30))
    R = bt.num_reads
    assignment = np.array([i % 2 for i in range(R)], dtype=np.int32)
    counts = partition_counts(bt, assignment, 2, weighted=True)
    reads = [oracle.frag_to_read(f) for f in frags]
    haps = oracle.hap_from_partition(reads, list(assignment), 2,
                                     weighted=True)
    # Oracle haps are keyed by global SNP; shift to local columns.
    same_m, diff_m = distance_matrix_eps(bt.alleles[:R], bt.weights[:R],
                                         counts, 0.03)
    for r in range(R):
        for p in range(2):
            s, d = oracle.dist_eps(reads[r], haps[p], 0.03)
            # local column = snp - lo; counts built on local columns
            assert same_m[r, p] == pytest.approx(s, abs=1e-4)
            assert diff_m[r, p] == pytest.approx(d, abs=1e-4)
            s1, d1 = distance_read_hap_eps(bt.alleles[r], bt.weights[r],
                                           counts[p], 0.03)
            assert s1 == pytest.approx(s, abs=1e-4)
            assert d1 == pytest.approx(d, abs=1e-4)


def test_mec_stats_matches_oracle():
    rng = np.random.default_rng(1)
    frags = _random_frags(rng, 30, 25, 2)
    bt = pack_block(frags, (1, 25))
    R = bt.num_reads
    assignment = np.array([i % 2 for i in range(R)], dtype=np.int32)
    reads = [oracle.frag_to_read(f) for f in frags]
    for weighted in (True, False):
        counts = partition_counts(bt, assignment, 2, weighted=weighted)
        cover = partition_cover(bt, assignment, 2)
        got = mec_stats_epsilon(counts, cover, 0.03)
        haps = oracle.hap_from_partition(reads, list(assignment), 2,
                                         weighted=weighted)
        want = oracle.mec_stats_epsilon(haps, 0.03)
        for p in range(2):
            assert got[p, 0] == pytest.approx(want[p][0], abs=1e-4)
            assert got[p, 1] == pytest.approx(want[p][1], abs=1e-4)


@pytest.mark.parametrize("ploidy,seed", [(2, 2), (3, 5), (2, 9), (4, 1),
                                         (5, 7)])
def test_beam_kernel_matches_oracle_exactly(ploidy, seed):
    """The device kernel (with tensor dedup) reproduces the exact oracle
    assignment read-for-read — not just co-clustering. A 400-instance
    study against the faithful C++ oracle (ploidies 2..5, windowed and
    mixed-ploidy dispatches) is in VALIDATION.md."""
    rng = np.random.default_rng(seed)
    frags = _random_frags(rng, 60, 40, ploidy)
    reads = [oracle.frag_to_read(f) for f in frags]
    want = oracle.beam_search(reads, ploidy, 0.03, beam_width=10)

    bt = pack_block(frags, (1, 40))
    opts = Options(epsilon=0.03, max_number_solns=10)
    got = phase_instances([(0, bt)], opts, ploidies=[ploidy])[(0, ploidy)]
    assert list(got) == list(want)


def test_beam_dedup_has_teeth():
    """Duplicate beams arise when a read's span is fully truncated away:
    engineered here with an early short read followed by far-downstream
    reads. With dedup the kernel matches the oracle exactly; without it,
    duplicate slots crowd out distinct ones (documenting why dedup is
    on by default)."""
    from floria_tpu.kernels import beam as beam_kernel

    rng = np.random.default_rng(0)
    ploidy = 3
    # One early read at SNPs 1-3, then reads covering SNPs 30+ only:
    # after truncation at 30, chains differing only in the early read's
    # part are identical blocks.
    frags = []
    frags.append(_mk_frag(0, {1: (0, 30), 2: (1, 30), 3: (0, 30)}))
    strains = rng.integers(0, 2, (ploidy, 60))
    for i in range(1, 40):
        k = rng.integers(0, ploidy)
        start = int(rng.integers(30, 45))
        sites = {}
        for snp in range(start, start + 12):
            allele = int(strains[k, snp - 1])
            if rng.random() < 0.03:
                allele = 1 - allele
            sites[snp] = (allele, int(rng.integers(10, 40)))
        frags.append(_mk_frag(i, sites))
    frags.sort(key=Frag.sort_key)
    for i, f in enumerate(frags):
        f.counter_id = i
    reads = [oracle.frag_to_read(f) for f in frags]
    want = oracle.beam_search(reads, ploidy, 0.03, beam_width=10)

    bt = pack_block(frags, (1, 60))
    alleles = bt.alleles[None]
    weights = bt.weights[None]
    nr = np.array([bt.num_reads], dtype=np.int32)
    eps = np.array([0.03], dtype=np.float32)
    res = beam_kernel.beam_search_batch(alleles, weights, nr, eps,
                                        ploidy=ploidy, beam_width=10)
    got = beam_kernel.traceback(
        tuple(np.asarray(a)[0] for a in res), bt.num_reads, ploidy)
    assert list(got) == list(want)


def test_upem_improves_and_matches_oracle():
    rng = np.random.default_rng(4)
    ploidy = 2
    frags = _random_frags(rng, 50, 30, ploidy)
    reads = [oracle.frag_to_read(f) for f in frags]
    bt = pack_block(frags, (1, 30))
    R = bt.num_reads
    # start from a random (bad) assignment
    assignment = rng.integers(0, ploidy, R).astype(np.int32)
    score0 = -sum(e for _b, e in oracle.mec_stats_epsilon(
        oracle.hap_from_partition(reads, list(assignment), ploidy, True),
        0.03))
    _score, refined = optimize_clustering(bt, assignment, ploidy, 0.03)
    want = oracle.upem_optimize(reads, list(assignment), ploidy, 0.03)
    score_got = -sum(e for _b, e in oracle.mec_stats_epsilon(
        oracle.hap_from_partition(reads, list(refined), ploidy, True),
        0.03))
    score_want = -sum(e for _b, e in oracle.mec_stats_epsilon(
        oracle.hap_from_partition(reads, want, ploidy, True), 0.03))
    assert score_got >= score0
    assert score_got == pytest.approx(score_want, rel=1e-6)


def test_pick_best_ploidy_rules():
    opts = Options(epsilon=0.05, ploidy_sensitivity=2,
                   stopping_heuristic=True)
    # Strong MEC drop from 1->2, flat afterwards: should pick 2.
    mec = np.array([100.0, 20.0, 19.0, 18.5, 18.4])
    expected = np.zeros(5)
    assert pick_best_ploidy(mec, expected, opts) == 2
    # MEC below expected errors at ploidy 1: stop at 1.
    mec2 = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    exp2 = np.full(5, 10.0)
    assert pick_best_ploidy(mec2, exp2, opts) == 1
    # No stopping heuristic: only the error threshold stops the sweep.
    opts2 = Options(epsilon=0.05, stopping_heuristic=False)
    assert pick_best_ploidy(mec, expected, opts2) == 5
    # Zero MEC at ploidy 1 -> nan ratio -> heuristic fires at ploidy 2.
    mec3 = np.array([0.0, 0.0, 0.0, 0.0, 0.0])
    exp3 = np.zeros(5)
    assert pick_best_ploidy(mec3, exp3, opts) == 1


def test_sweep_decide_matches_pick_best():
    """The adaptive level-wise stop (_sweep_decide) must reproduce the
    full-vector replay (pick_best_ploidy) for every stopping pattern."""
    from floria_tpu.phase.local import _sweep_decide

    rng = np.random.default_rng(7)
    for sens in (1, 2, 3):
        for heur in (True, False):
            opts = Options(epsilon=0.03, ploidy_sensitivity=sens,
                           stopping_heuristic=heur, max_ploidy=5)
            for _trial in range(300):
                mec = rng.choice(
                    [0.0, 0.5, 1.0, 3.0, 10.0, 30.0, 100.0], size=5)
                exp = rng.choice([0.1, 1.0, 5.0, 50.0], size=5)
                want = pick_best_ploidy(mec, exp, opts)
                got = None
                for p in range(1, 6):
                    decided, best = _sweep_decide(mec[:5], exp[:5], p,
                                                  opts)
                    if decided:
                        got = best
                        break
                assert got == want, (mec, exp, sens, heur)


def test_dispatch_cap_chunking_is_output_invariant(monkeypatch):
    """Capping a shape group's batch into several dispatch chunks (the
    whole-chromosome HBM guard in _sweep_launch) must not change any
    block's refined assignment or MEC stats: per-instance results are
    independent of batch composition."""
    from floria_tpu.phase import local as L

    # The env override takes precedence over everything; clear it so
    # the small-cap run below actually chunks.
    monkeypatch.delenv("FLORIA_SWEEP_CAP_CELLS", raising=False)

    def run_all(sweep_cap="auto"):
        blocks = []
        for j in range(7):
            rng = np.random.default_rng(50 + j)
            frags = _random_frags(rng, 24, 48, 2)
            bt = pack_block(frags, (1, 48))
            blocks.append(((0, j), bt))
        opts = Options(epsilon=0.02, max_ploidy=3,
                       sweep_cap=sweep_cap)
        cache = L.BlockDeviceCache(blocks)
        pending = L._sweep_launch(blocks, opts, cache, [2])
        return L._sweep_pull(pending)

    ref_refined, ref_stats = run_all()
    # Shrink the budget (via the --sweep-cap path) so each 7-block
    # group splits into >=3 chunks.
    chunk_refined, chunk_stats = run_all(sweep_cap=str(2 * 64 * 64))
    assert set(ref_refined) == set(chunk_refined)
    for k in ref_refined:
        np.testing.assert_array_equal(ref_refined[k], chunk_refined[k])
        assert ref_stats[k] == chunk_stats[k]


def test_cache_row_padding_is_output_invariant():
    """BlockDeviceCache pads its resident batch dim to buckets
    (_bucket_cache_rows) so nearby block counts share one sweep-chain
    jit variant; padded rows are never gathered, so per-block results
    must not depend on how many OTHER blocks share the cache."""
    from floria_tpu.phase import local as L

    assert [L._bucket_cache_rows(b) for b in (1, 7, 8, 9, 128, 129,
                                              300)] == [
        8, 8, 8, 16, 128, 192, 320]

    def run(n_blocks):
        blocks = []
        for j in range(n_blocks):
            rng = np.random.default_rng(80 + j)
            frags = _random_frags(rng, 24, 48, 2)
            bt = pack_block(frags, (1, 48))
            blocks.append(((0, j), bt))
        opts = Options(epsilon=0.02, max_ploidy=3)
        cache = L.BlockDeviceCache(blocks)
        return L._sweep_pull(L._sweep_launch(blocks, opts, cache, [2]))

    small_refined, small_stats = run(5)    # B_pad = 8
    big_refined, big_stats = run(11)       # B_pad = 16
    for k in small_refined:
        np.testing.assert_array_equal(small_refined[k], big_refined[k])
        assert small_stats[k] == big_stats[k]


def test_fused_level12_matches_sequential_schedule(monkeypatch):
    """adaptive_sweep's fused (1, 2) first wave must reproduce the
    strictly sequential per-level schedule (the speculative path keeps
    that legacy schedule, so FLORIA_SWEEP_SPEC=1 pins it) — including
    blocks that stop AT level 1 (haploid: fused discards the level-2
    result) and blocks sent back to level 1 by the stopping heuristic
    at level 2."""
    from floria_tpu.phase import local as L

    def build():
        blocks = []
        for j in range(8):
            rng = np.random.default_rng(130 + j)
            # j % 4 == 0 -> error-free single-strain: MEC 0 beats the
            # expected-error floor, so the sweep decides at ploidy 1.
            if j % 4 == 0:
                frags = _random_frags(rng, 28, 56, 1, eps=0.0)
            else:
                frags = _random_frags(rng, 28, 56, 2 + j % 3)
            bt = pack_block(frags, (1, 56))
            blocks.append(((0, j), bt))
        return blocks

    opts = Options(epsilon=0.02, max_ploidy=4)
    monkeypatch.setenv("FLORIA_SWEEP_SPEC", "1")
    c_seq, m_seq, e_seq = L.adaptive_sweep(build(), opts)
    monkeypatch.setenv("FLORIA_SWEEP_SPEC", "0")
    c_fused, m_fused, e_fused = L.adaptive_sweep(build(), opts)
    assert set(c_seq) == set(c_fused)
    assert 1 in {v[0] for v in c_seq.values()}  # haploid case exercised
    for k in c_seq:
        assert c_seq[k][0] == c_fused[k][0]
        np.testing.assert_array_equal(c_seq[k][1], c_fused[k][1])
        np.testing.assert_array_equal(m_seq[k], m_fused[k])
        np.testing.assert_array_equal(e_seq[k], e_fused[k])


def test_sweep_cap_precedence(monkeypatch):
    """Dispatch budget precedence: FLORIA_SWEEP_CAP_CELLS env >
    --sweep-cap N > auto link probe (_sweep_cap_cells)."""
    from floria_tpu.phase import local as L

    monkeypatch.delenv("FLORIA_SWEEP_CAP_CELLS", raising=False)
    monkeypatch.setattr(L, "_probed_cap", 12345)
    assert L._sweep_cap_cells() == 12345  # auto -> probe
    assert L._sweep_cap_cells(Options(sweep_cap="777")) == 777
    monkeypatch.setenv("FLORIA_SWEEP_CAP_CELLS", "5242880")
    assert L._sweep_cap_cells(Options(sweep_cap="777")) == 5242880
    monkeypatch.setenv("FLORIA_SWEEP_CAP_CELLS", "not-a-number")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="FLORIA_SWEEP_CAP_CELLS"):
        L._sweep_cap_cells()


def test_sweep_cap_auto_probe(monkeypatch):
    """The auto probe returns one of the two tuned caps and caches its
    answer (one probe per process)."""
    from floria_tpu.phase import local as L

    monkeypatch.setattr(L, "_probed_cap", None)
    cap = L._probe_link_cap()
    assert cap in (L._SWEEP_CAP_CELLS, L._SWEEP_CAP_CELLS_LOCAL)
    assert L._probe_link_cap() is L._probed_cap


def test_plane_fast_path_equals_f64_fallback(monkeypatch):
    """The all-f32 plane-pair fast path (R <= _R_CHUNK) and the
    combined-f64 fallback (R > _R_CHUNK) must compute bit-identical
    results — both are realizations of the same exact integer-quanta
    arithmetic (kernels/beam.py _step_hist). Forcing _R_CHUNK tiny
    routes a normal-sized instance through the fallback (with real
    R-chunked plane matmuls) for a direct A/B; the distinctive shape
    avoids jit-cache collisions with fast-path traces."""
    import floria_tpu.kernels.upem_batch as upem_batch
    from floria_tpu.kernels.upem_batch import upem_eval_batch

    rng = np.random.default_rng(123)
    frags = _random_frags(rng, 52, 33, 3)
    bt = pack_block(frags, (1, 33))
    alleles = bt.alleles[None]
    weights = bt.weights[None]
    nr = np.array([bt.num_reads], dtype=np.int32)
    eps = np.array([0.03], dtype=np.float32)

    def run_beam():
        res = beam_kernel.beam_search_batch(
            alleles, weights, nr, eps, ploidy=3, beam_width=10)
        return [np.asarray(a) for a in res]

    def run_upem():
        R = alleles.shape[1]
        assign = np.arange(R, dtype=np.int32)[None] % 3
        return [np.asarray(a) for a in upem_eval_batch(
            alleles, weights, assign, eps, 3)]

    fast_beam, fast_upem = run_beam(), run_upem()
    monkeypatch.setattr(beam_kernel, "_R_CHUNK", 16)
    monkeypatch.setattr(upem_batch, "_R_CHUNK", 16)
    # New shapes force a retrace; same shapes would reuse the cached
    # fast-path executable, so pad by one row to mint fresh variants.
    alleles = np.concatenate([alleles, alleles[:, :1]], axis=1)
    weights = np.concatenate([weights, weights[:, :1]], axis=1)
    weights[:, -1] = 0.0
    alleles[:, -1] = -1
    slow_beam = [np.asarray(a) for a in beam_kernel.beam_search_batch(
        alleles, weights, nr, eps, ploidy=3, beam_width=10)]
    R = alleles.shape[1]
    assign = np.arange(R, dtype=np.int32)[None] % 3
    slow_upem = [np.asarray(a) for a in upem_eval_batch(
        alleles, weights, assign, eps, 3)]

    # Beam: compare per-read traceback records over the real reads
    # (the padding row adds one identity record).
    for f, s, name in ((fast_beam[0], slow_beam[0], "warm_parents"),
                       (fast_beam[1], slow_beam[1], "warm_parts"),
                       (fast_beam[4], slow_beam[4], "scores"),
                       (fast_beam[5], slow_beam[5], "live")):
        np.testing.assert_array_equal(f, s, err_msg=name)
    np.testing.assert_array_equal(fast_beam[2],
                                  slow_beam[2][:, :-1] if
                                  slow_beam[2].shape[1] ==
                                  fast_beam[2].shape[1] + 1
                                  else slow_beam[2])
    # UPEM: diff on real rows, score, mec must match bitwise.
    np.testing.assert_array_equal(fast_upem[0],
                                  slow_upem[0][:, :-1])
    np.testing.assert_array_equal(fast_upem[1], slow_upem[1])
    np.testing.assert_array_equal(fast_upem[2], slow_upem[2])


def test_state_impls_bitwise_equal():
    """The three beam state representations — "planes" (persistent
    count-plane pair, production for R <= _R_CHUNK), "hist"
    (history-state reconstruction), and "counts" (materialized f64
    quanta) — are realizations of the same exact integer arithmetic and
    must return bit-identical results, mixed ploidies, dedup on,
    windowed and full-S (kernels/beam.py _step_planes)."""
    rng = np.random.default_rng(2025)
    G = 4
    S = 160
    packs = []
    for g in range(G):
        frags = _random_frags(rng, 40 + 8 * g, S, 2 + g % 3)
        packs.append(pack_block(frags, (1, S)))
    R = max(p.alleles.shape[0] for p in packs)
    alleles = np.full((G, R, S), -1, dtype=np.int8)
    weights = np.zeros((G, R, S), dtype=np.float32)
    for g, p in enumerate(packs):
        r, s = p.alleles.shape
        alleles[g, :r, :s] = p.alleles
        weights[g, :r, :s] = p.weights
    nr = np.array([p.num_reads for p in packs], dtype=np.int32)
    eps = np.full(G, 0.02, dtype=np.float32)
    nparts = np.array([2, 3, 4, 5], dtype=np.int32)

    # window must be >= read span + 128 (beam_search_batch contract);
    # _random_frags spans 12 columns, so 144 is a valid narrow window.
    for window in (0, 144):
        outs = {}
        for impl in ("planes", "hist", "counts"):
            outs[impl] = [np.asarray(a)
                          for a in beam_kernel.beam_search_batch_mixed(
                              alleles, weights, nr, eps, nparts, 5, 10,
                              max_alleles=2, window=window, impl=impl)]
        for impl in ("hist", "counts"):
            for a, b, name in zip(outs["planes"], outs[impl],
                                  ("warm_parents", "warm_parts",
                                   "main_parents", "main_parts",
                                   "scores", "live")):
                np.testing.assert_array_equal(
                    a, b, err_msg=f"{impl} vs planes: {name} "
                    f"(window={window})")
