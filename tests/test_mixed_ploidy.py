"""Mixed-ploidy beam batch must match per-ploidy batches exactly."""

import numpy as np

import jax.numpy as jnp

from floria_tpu.kernels import beam as beam_kernel


def _toy(G, R=40, S=128, seed=0):
    rng = np.random.default_rng(seed)
    alleles = rng.integers(-1, 2, (G, R, S)).astype(np.int8)
    weights = np.where(alleles >= 0,
                       rng.uniform(0.9, 1.0, (G, R, S)), 0.0).astype(
        np.float32)
    num_reads = np.full(G, R, np.int32)
    num_reads[-1] = R - 5
    eps = np.full(G, 0.02, np.float32)
    return alleles, weights, num_reads, eps


def test_mixed_matches_per_ploidy():
    G = 6
    args = _toy(G)
    num_parts = np.array([2, 3, 4, 5, 3, 2], np.int32)
    mixed = beam_kernel.beam_search_batch_mixed(
        *args, jnp.asarray(num_parts), max_ploidy=5, beam_width=6)
    for g in range(G):
        p = int(num_parts[g])
        single = beam_kernel.beam_search_batch(
            *(a[g:g + 1] for a in args), ploidy=p, beam_width=6)
        a_mixed = beam_kernel.traceback(
            tuple(np.asarray(x[g]) for x in mixed), int(args[2][g]), p)
        a_single = beam_kernel.traceback(
            tuple(np.asarray(x[0]) for x in single), int(args[2][g]), p)
        np.testing.assert_array_equal(a_mixed, a_single, err_msg=f"g={g}")
        # Scores of live slots agree (mixed has max_ploidy*W slots;
        # the first num_parts*W cover the per-ploidy beam).
        s_m = np.asarray(mixed.scores[g])
        s_s = np.asarray(single.scores[0])
        lm = np.asarray(mixed.live[g])
        ls = np.asarray(single.live[0])
        np.testing.assert_array_equal(lm[:len(ls)], ls)
        np.testing.assert_allclose(s_m[:len(s_s)][ls], s_s[ls],
                                   rtol=1e-6)
