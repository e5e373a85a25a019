"""Windowed beam scan must produce identical results to the full-width
scan: columns behind the sorted-read frontier are provably never read."""

import numpy as np
import pytest

from floria_tpu.kernels import beam as beam_kernel


def _long_block(G=2, R=60, S=512, ploidy=2, span=80, seed=0):
    rng = np.random.default_rng(seed)
    strains = rng.integers(0, 2, (G, ploidy, S))
    alleles = np.full((G, R, S), -1, np.int8)
    weights = np.zeros((G, R, S), np.float32)
    starts = np.sort(rng.integers(0, S - span, (G, R)), axis=1)
    for g in range(G):
        for r in range(R):
            s0 = starts[g, r]
            k = rng.integers(0, ploidy)
            hap = strains[g, k, s0:s0 + span].copy()
            err = rng.random(span) < 0.03
            hap[err] = 1 - hap[err]
            alleles[g, r, s0:s0 + span] = hap
            weights[g, r, s0:s0 + span] = (
                1.0 - 10.0 ** (rng.integers(10, 40, span) / -10.0))
    nreads = np.full(G, R, np.int32)
    nreads[-1] = R - 9
    eps = np.full(G, 0.02, np.float32)
    return alleles, weights, nreads, eps


@pytest.mark.parametrize("window", [256, 384])
def test_windowed_matches_full(window):
    args = _long_block()
    full = beam_kernel.beam_search_batch(*args, ploidy=2, beam_width=6)
    win = beam_kernel.beam_search_batch(*args, ploidy=2, beam_width=6,
                                        window=window)
    for name, a, b in zip(full._fields, full, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_window_offsets_monotone():
    import jax.numpy as jnp
    args = _long_block(G=1)
    covered = jnp.asarray(args[0][0] >= 0)
    offs = np.asarray(beam_kernel._window_offsets(covered, 512, 256))
    assert (np.diff(offs) >= 0).all()
    assert offs.max() <= 512 - 256
    assert (offs % 128 == 0).all()
