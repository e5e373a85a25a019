"""Pallas beam kernel vs the XLA scan kernel: identical results.

Runs the Pallas kernel in interpreter mode on the CPU backend."""

import numpy as np
import pytest

from floria_tpu.kernels import beam as beam_xla
from floria_tpu.kernels import beam_pallas


def _workload(G, R, S, ploidy, seed=0):
    rng = np.random.default_rng(seed)
    strains = rng.integers(0, 2, (G, ploidy, S))
    alleles = np.full((G, R, S), -1, dtype=np.int8)
    weights = np.zeros((G, R, S), dtype=np.float32)
    span = S // 2
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
    num_reads = np.full(G, R, dtype=np.int32)
    num_reads[-1] = R - 7  # exercise padding rows
    eps = np.full(G, 0.02, dtype=np.float32)
    return alleles, weights, num_reads, eps


@pytest.mark.parametrize("ploidy", [2, 3])
def test_pallas_matches_xla(ploidy):
    """Final beam scores, liveness, and best-beam assignments must agree;
    parent records of dead (inf-score) slots are representation details
    that legitimately differ between top_k and extract-min."""
    G, R, S = 3, 40, 128
    args = _workload(G, R, S, ploidy)
    want = beam_xla.beam_search_batch(*args, ploidy=ploidy, beam_width=4)
    got = beam_pallas.beam_search_batch_pallas(
        *args, ploidy=ploidy, beam_width=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(want.scores), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.live),
                                  np.asarray(want.live))
    for g in range(G):
        nr = int(args[2][g])
        a1 = beam_xla.traceback(tuple(np.asarray(x[g]) for x in want),
                                nr, ploidy)
        a2 = beam_xla.traceback(tuple(np.asarray(x[g]) for x in got),
                                nr, ploidy)
        np.testing.assert_array_equal(a1, a2)


def test_pallas_traceback_assignment():
    ploidy = 2
    G, R, S = 2, 40, 128
    args = _workload(G, R, S, ploidy, seed=5)
    xla = beam_xla.beam_search_batch(*args, ploidy=ploidy, beam_width=4)
    pls = beam_pallas.beam_search_batch_pallas(
        *args, ploidy=ploidy, beam_width=4, interpret=True)
    for g in range(G):
        nr = int(args[2][g])
        a1 = beam_xla.traceback(tuple(np.asarray(x[g]) for x in xla),
                                nr, ploidy)
        a2 = beam_xla.traceback(tuple(np.asarray(x[g]) for x in pls),
                                nr, ploidy)
        np.testing.assert_array_equal(a1, a2)


def test_supported_shapes():
    assert beam_pallas.supported(256, 256, 5, 10)
    assert not beam_pallas.supported(16, 256, 5, 10)   # below warmup
    assert not beam_pallas.supported(256, 200, 5, 10)  # lane misaligned
