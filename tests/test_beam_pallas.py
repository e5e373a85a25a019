"""Pallas beam kernel vs the XLA impl (interpret mode on CPU).

The Pallas kernel (kernels/beam_pallas.py) must reproduce the XLA beam
search assignment-for-assignment — same candidate scoring, dedup, and
rank-select — across ploidies, mixed num_parts, and padded reads. On
the forced-CPU test backend it runs in interpreter mode; the on-chip
twin of this comparison runs inside the FLORIA_TPU_E2E smoke test and
scripts/pallas_ab.py.
"""

import numpy as np
import pytest

from floria_tpu.kernels import beam as B
from floria_tpu.kernels.beam_pallas import (beam_search_batch_pallas,
                                            supports_shape)


def _make(G, R, S, P, seed, A=2):
    rng = np.random.default_rng(seed)
    alleles = np.full((G, R, S), -1, np.int8)
    weights = np.zeros((G, R, S), np.float32)
    for g in range(G):
        strains = rng.integers(0, A, (P, S))
        for r in range(R):
            s0 = rng.integers(0, max(1, S - 16))
            span = rng.integers(8, 16)
            hap = strains[rng.integers(0, P), s0:s0 + span].copy()
            err = rng.random(span) < 0.05
            hap[err] = (hap[err] + 1) % A
            alleles[g, r, s0:s0 + span] = hap
            weights[g, r, s0:s0 + span] = 1.0 - 10.0 ** (
                rng.integers(10, 40, span) / -10.0)
    order = np.argsort(np.argmax(alleles >= 0, axis=2), axis=1,
                       kind="stable")
    alleles = np.take_along_axis(alleles, order[:, :, None], axis=1)
    weights = np.take_along_axis(weights, order[:, :, None], axis=1)
    return alleles, weights


@pytest.mark.parametrize("G,R,S,P,W,seed,nparts", [
    (3, 40, 64, 3, 10, 0, (3, 2, 3)),
    (2, 30, 32, 2, 10, 1, (2, 2)),
    (2, 60, 128, 5, 10, 2, (5, 4)),
])
def test_pallas_matches_xla(G, R, S, P, W, seed, nparts):
    assert supports_shape(R, P, W)
    alleles, weights = _make(G, R, S, P, seed)
    num_reads = np.array([R - (g % 7) for g in range(G)], np.int32)
    eps = np.full(G, 0.03, np.float32)
    np_v = np.asarray(nparts, np.int32)
    ref = B.beam_search_batch_mixed(alleles, weights, num_reads, eps,
                                    np_v, P, W, max_alleles=2)
    got = beam_search_batch_pallas(alleles, weights, num_reads, eps,
                                   np_v, P, W, max_alleles=2,
                                   interpret=True)
    ra = np.asarray(B.traceback_batch(tuple(ref)))
    ga = np.asarray(B.traceback_batch(tuple(got)))
    for g in range(G):
        nr = num_reads[g]
        np.testing.assert_array_equal(ra[g, :nr], ga[g, :nr])
    assert np.array_equal(np.asarray(ref.live), np.asarray(got.live))
    # The XLA kernel's scores are exact integer 2^-26 quanta (f64);
    # the Pallas experiment keeps weight-unit f32 scores. Rescale for
    # the comparison (exact power-of-two).
    rs = np.where(np.asarray(ref.live),
                  np.asarray(ref.scores) / float(1 << 26), 0.0)
    gs = np.where(np.asarray(got.live), np.asarray(got.scores), 0.0)
    np.testing.assert_allclose(rs, gs, atol=1e-4)


def test_supports_shape_bounds():
    from floria_tpu import constants

    assert not supports_shape(constants.BEAM_WARMUP_READS, 2, 10)
    assert supports_shape(constants.BEAM_WARMUP_READS + 1, 2, 10)
    assert not supports_shape(400, 13, 10)  # int8 record overflow
