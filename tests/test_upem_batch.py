"""Batched UPEM must match the per-block numpy implementation (which is
itself validated against the exact oracle)."""

import numpy as np
import pytest

from floria_tpu.frag import Frag
from floria_tpu.kernels.blocktensor import pack_block
from floria_tpu.kernels.upem import mec_epsilon_score, optimize_clustering
from floria_tpu.kernels.upem_batch import optimize_batch, upem_eval_batch
from floria_tpu.kernels.stats import distance_matrix_eps
from floria_tpu.kernels.blocktensor import (partition_counts,
                                            partition_cover)
from floria_tpu.kernels.stats import mec_stats_epsilon


def _mk_block(seed, num_reads=40, num_snps=30, ploidy=2):
    rng = np.random.default_rng(seed)
    strains = rng.integers(0, 2, (ploidy, num_snps))
    frags = []
    for i in range(num_reads):
        k = rng.integers(0, ploidy)
        start = int(rng.integers(1, num_snps - 10))
        f = Frag(f"r{i}", i, False)
        for snp in range(start, min(num_snps, start + 12) + 1):
            allele = int(strains[k, snp - 1])
            if rng.random() < 0.05:
                allele = 1 - allele
            f.add_site(snp, allele, int(rng.integers(10, 40)), 0, 0)
        f.freeze()
        frags.append(f)
    frags.sort(key=Frag.sort_key)
    for i, f in enumerate(frags):
        f.counter_id = i
    return pack_block(frags, (1, num_snps))


@pytest.mark.parametrize("ploidy,seed", [(2, 0), (3, 7)])
def test_eval_matches_numpy(ploidy, seed):
    bt = _mk_block(seed, ploidy=ploidy)
    R = bt.num_reads
    rng = np.random.default_rng(seed + 1)
    assignment = rng.integers(0, ploidy, R).astype(np.int32)
    eps = 0.03

    G = 1
    r_pad, s_pad = bt.alleles.shape
    assigns = np.zeros((G, r_pad), dtype=np.int32)
    assigns[0, :R] = assignment
    diff, score, mec = (np.asarray(x) for x in upem_eval_batch(
        bt.alleles[None], bt.weights[None], assigns,
        np.full(1, eps, np.float32), ploidy))

    counts = partition_counts(bt, assignment, ploidy, weighted=True)
    _same_np, diff_np = distance_matrix_eps(bt.alleles[:R],
                                            bt.weights[:R], counts, eps)
    np.testing.assert_allclose(diff[0, :R], diff_np, rtol=1e-4,
                               atol=1e-4)
    want_score = mec_epsilon_score(bt, assignment, ploidy, eps)
    assert score[0] == pytest.approx(want_score, rel=1e-4)

    ucounts = partition_counts(bt, assignment, ploidy, weighted=False)
    ucover = partition_cover(bt, assignment, ploidy)
    ustats = mec_stats_epsilon(ucounts, ucover, eps)
    assert mec[0, 0] == pytest.approx(ustats[:, 0].sum(), rel=1e-4)
    assert mec[0, 1] == pytest.approx(ustats[:, 1].sum(), rel=1e-4)


@pytest.mark.parametrize("ploidy", [2, 3])
def test_optimize_batch_matches_sequential(ploidy):
    eps = 0.03
    blocks = [_mk_block(s, ploidy=ploidy) for s in (11, 12, 13)]
    rng = np.random.default_rng(99)
    G = len(blocks)
    r_pad = max(b.alleles.shape[0] for b in blocks)
    s_pad = max(b.alleles.shape[1] for b in blocks)
    alleles = np.full((G, r_pad, s_pad), -1, np.int8)
    weights = np.zeros((G, r_pad, s_pad), np.float32)
    assigns = np.zeros((G, r_pad), np.int32)
    nreads = np.zeros(G, np.int32)
    starts = []
    for g, bt in enumerate(blocks):
        r, s = bt.alleles.shape
        alleles[g, :r, :s] = bt.alleles
        weights[g, :r, :s] = bt.weights
        a = rng.integers(0, ploidy, bt.num_reads).astype(np.int32)
        starts.append(a)
        assigns[g, :bt.num_reads] = a
        nreads[g] = bt.num_reads
    out, mec = optimize_batch(alleles, weights, assigns, nreads,
                              np.full(G, eps, np.float32), ploidy)
    for g, bt in enumerate(blocks):
        _score, want = optimize_clustering(bt, starts[g], ploidy, eps)
        np.testing.assert_array_equal(out[g, :bt.num_reads], want)


def test_upem_device_matches_host_lockstep():
    """The single-dispatch on-device optimize loop (while_loop + scanned
    move walk) must reproduce the host lockstep walk bit-for-bit."""
    import jax.numpy as jnp
    import numpy as np

    from bench import make_workload
    from floria_tpu.kernels import upem_batch

    for seed in (0, 1, 2):
        G, R, S = 4, 64, 128
        alleles, weights, num_reads, eps = make_workload(G, R, S,
                                                         seed=seed)
        rng = np.random.default_rng(seed + 100)
        ploidy = 3
        assign0 = rng.integers(0, ploidy, (G, R)).astype(np.int32)
        best_h, mec_h = upem_batch.optimize_batch(
            alleles, weights, assign0.copy(), num_reads, eps, ploidy)
        best_d, mec_d, _ = upem_batch.upem_optimize_device(
            jnp.asarray(alleles), jnp.asarray(weights),
            jnp.asarray(assign0), jnp.asarray(num_reads),
            jnp.asarray(eps), ploidy)
        assert (np.asarray(best_d) == best_h).all()
        assert np.allclose(np.asarray(mec_d), mec_h)
