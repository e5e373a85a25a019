"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax

from floria_tpu.kernels import beam as beam_kernel
from floria_tpu.parallel.mesh import (beam_search_sharded, make_block_mesh,
                                      training_step_sharded)


def _toy_batch(G, R=12, S=64, seed=0):
    rng = np.random.default_rng(seed)
    alleles = rng.integers(-1, 2, (G, R, S)).astype(np.int8)
    weights = np.where(alleles >= 0, 0.97, 0.0).astype(np.float32)
    num_reads = np.full(G, R, dtype=np.int32)
    epsilon = np.full(G, 0.02, dtype=np.float32)
    return alleles, weights, num_reads, epsilon


def test_sharded_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = make_block_mesh()
    args = _toy_batch(G=11)  # non-multiple of 8 exercises padding
    nparts = np.full(11, 2, np.int32)
    got = beam_search_sharded(mesh, *args, nparts, max_ploidy=2,
                              beam_width=5)
    want = tuple(np.asarray(a) for a in beam_kernel.beam_search_batch(
        *args, ploidy=2, beam_width=5))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_training_step_collective():
    """The sharded step's all_gather'd per-block partition summaries
    must equal the single-device kernel's host traceback."""
    mesh = make_block_mesh()
    args = _toy_batch(G=8, seed=3)
    step = training_step_sharded(mesh, ploidy=2, beam_width=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("block"))
    dev_args = [jax.device_put(a, sharding) for a in args]
    assigns, total = step(*dev_args)
    assert assigns.shape == (8, 12)
    assert np.isfinite(float(total))
    res = beam_kernel.beam_search_batch(*args, ploidy=2, beam_width=4)
    host = tuple(np.asarray(a) for a in res)
    for g in range(8):
        want = beam_kernel.traceback(tuple(a[g] for a in host), 12, 2)
        np.testing.assert_array_equal(np.asarray(assigns)[g], want)


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, fnargs = g.entry()
    out = jax.jit(fn)(*fnargs)
    assert len(out) == 6
    g.dryrun_multichip(8)
