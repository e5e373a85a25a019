"""Pallas TPU beam-search kernel: the whole per-read scan in VMEM.

The XLA beam kernel (kernels/beam.py) is HBM-bound: every scan step
re-reads the read-weight tensor and round-trips the reconstructed
window through HBM (~8.6 MB/step at the real block shape — 60% HBM
utilization measured, scripts/mfu.py). This kernel instead keeps the
ENTIRE beam state — the materialized count tensor [B, P, A, S], the
assignment history, and the scores — resident in VMEM for the whole
scan, streaming each instance's inputs from HBM exactly once (grid
over instances, auto-pipelined). Per-step HBM traffic drops from
megabytes to the traceback-record row (~50 B).

Semantics are the counts-impl twin of kernels/beam.py:_step (which is
bit-identical to the production hist impl): identical candidate
scoring, pruning, dedup (wrapping-uint32 truncated-block fingerprints)
and rank-by-counting selection, identical incremental count updates in
read-insertion order. The wrapper returns the same BeamResult tuple,
so traceback_batch and every caller are unchanged. Reference:
global_clustering.rs:10-208.

Exactness: count states are bitwise identical to the XLA impls (the
one-hot beam gather is an exact permutation; updates add in the same
read order). The same/diff reductions over S may differ from XLA's in
final-ulp rounding (different reduction trees); assignment-level
equality vs the XLA kernel and the host oracle is what the tests pin
— the same contract the two XLA impls already share.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from . import beam as beam_x
from .scores import binom_tail_jnp, log_sum_exp_jnp

# Python-float scalars: Pallas kernels cannot capture materialized jax
# arrays, but python literals inline fine.
_BIG = 1e30
_BIG_CUT = 1e29
_INF = float("inf")


def _iota(n, dtype=jnp.int32):
    """1D iota via broadcasted_iota (plain 1D iota fails on TPU)."""
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)[:, 0]


def _rank_select_k(cand, out_slots):
    """kernels/beam.py:_rank_select with TPU-safe iota."""
    B, P = cand.shape
    N = B * P
    flat = jnp.minimum(cand.reshape(N), _BIG)
    gen = _iota(N)
    less = ((flat[None, :] < flat[:, None])
            | ((flat[None, :] == flat[:, None])
               & (gen[None, :] < gen[:, None])))
    rank = less.sum(axis=1)
    sel = (rank[None, :] == _iota(out_slots)[:, None]).astype(
        jnp.float32)
    sel_score = (sel * flat[None, :]).sum(-1)
    sel3 = sel.reshape(out_slots, B, P)
    gather_oh = sel3.sum(-1)
    part_oh = sel3.sum(-2)
    parent = (gather_oh @ _iota(B).astype(jnp.float32)).astype(
        jnp.int32)
    part = (part_oh @ _iota(P).astype(jnp.float32)).astype(jnp.int32)
    return sel_score, gather_oh, part_oh, parent, part


def _make_kernel(R, S, P, W, A, T1, gs_np, dedup):
    """Build the kernel body for one (shape, ploidy, beam) variant."""
    import math

    from jax.experimental import pallas as pl

    B1 = P * W
    cutoff = float(math.log(constants.PROB_CUTOFF))
    div = float(constants.DIV_FACTOR)

    def kernel(nr_ref, eps_ref, np_ref, alleles_ref, weights_ref,
               z0_ref, z1_ref, g0_ref, g1_ref,
               wpar_ref, wprt_ref, mpar_ref, mprt_ref, sc_ref, lv_ref,
               counts_ref, hist_ref, score_ref):
        g = pl.program_id(0)
        nr = nr_ref[g]
        eps = eps_ref[g]
        nparts = np_ref[g]
        part_active = _iota(P) < nparts
        warm_width = nparts * W

        # Reset persistent scratch (grid steps share it).
        counts_ref[...] = jnp.zeros((B1, P, A, S), jnp.float32)
        hist_ref[...] = jnp.zeros((B1, P, R), jnp.float32)
        score_ref[...] = jnp.where(_iota(B1) == 0, 0.0, _INF).astype(
            jnp.float32)[None, :]

        def step(t, B_in, out_slots, width, par_ref, prt_ref, row):
            valid = t < nr
            al_t = alleles_ref[0, t, :]                       # [S] i8
            w_t = weights_ref[0, t, :]                        # [S] f32
            oh_t = (al_t[None, :]
                    == _iota(A, al_t.dtype)[:, None]).astype(
                jnp.float32)                                  # [A, S]
            a_cov = al_t >= 0                                 # [S]

            counts = counts_ref[0:B_in]            # [B, P, A, S]
            hist = hist_ref[0:B_in]                # [B, P, R]
            score = score_ref[0, 0:B_in]           # [B]
            live = jnp.isfinite(score)

            maxc = counts.max(axis=2)                         # [B,P,S]
            at = (counts * oh_t[None, None]).sum(axis=2)
            empty = maxc == 0.0
            cov = a_cov[None, None, :]
            w = w_t[None, None, :]
            same = (w * (cov & ~empty & (at == maxc))).sum(-1)
            diff = ((w * (cov & ~empty & (at < maxc))).sum(-1)
                    + eps * (cov & empty).sum(-1))
            pval = binom_tail_jnp(same + diff, diff, eps, div)
            pval = jnp.where(part_active[None, :], pval, -_INF)
            lse = log_sum_exp_jnp(pval, axis=-1)
            keep = ((pval - lse[:, None]) > cutoff) \
                & part_active[None, :]
            cand = jnp.where(keep & live[:, None],
                             score[:, None] + diff, _INF)

            if dedup:
                h_list = []
                hmask = hist != 0
                zero = jnp.zeros((), jnp.uint32)
                for z_ref, g_ref in ((z0_ref, g0_ref),
                                     (z1_ref, g1_ref)):
                    gp = g_ref[0, :]                          # [P] u32
                    zt = z_ref[0, t, :]                       # [R] u32
                    ph = jnp.where(hmask, zt[None, None, :],
                                   zero).sum(axis=-1,
                                             dtype=jnp.uint32)
                    rc = z_ref[0, t, t]
                    h_list.append(
                        ((ph * gp[None, :]).sum(axis=-1)[:, None]
                         + gp[None, :] * rc).reshape(B_in * P))
                flat = cand.reshape(B_in * P)
                gen = _iota(B_in * P)
                finite = jnp.isfinite(flat)
                eq = functools.reduce(
                    jnp.logical_and,
                    [(h[:, None] == h[None, :]) for h in h_list])
                dup = (eq & (gen[None, :] < gen[:, None])
                       & finite[None, :]
                       & (flat[None, :] >= flat[:, None]))
                cand = jnp.where(dup.any(axis=1).reshape(B_in, P),
                                 _INF, cand)

            sel_score, gather_oh, part_oh, parent, part = \
                _rank_select_k(cand, out_slots)
            new_live = (_iota(out_slots) < width) \
                & (sel_score < _BIG_CUT)

            # Exact one-hot permutation (identical to the XLA gather).
            neww = jnp.dot(gather_oh,
                           counts.reshape(B_in, P * A * S),
                           preferred_element_type=jnp.float32
                           ).reshape(out_slots, P, A, S)
            update = w_t[None, :] * oh_t                      # [A, S]
            neww = neww + part_oh[:, :, None, None] * update[
                None, None]
            newhist = jnp.dot(gather_oh, hist.reshape(B_in, P * R),
                              preferred_element_type=jnp.float32
                              ).reshape(out_slots, P, R)
            t_oh = (_iota(R) == t).astype(jnp.float32)
            newhist = newhist + part_oh[:, :, None] * t_oh[
                None, None, :]
            new_score = jnp.where(new_live, sel_score, _INF)

            counts_ref[0:out_slots] = jnp.where(
                valid, neww, counts_ref[0:out_slots])
            hist_ref[0:out_slots] = jnp.where(
                valid, newhist, hist_ref[0:out_slots])
            score_ref[0, 0:out_slots] = jnp.where(
                valid, new_score, score_ref[0, 0:out_slots])
            par_ref[0, row] = jnp.where(
                valid, parent, _iota(out_slots)).astype(jnp.int8)
            prt_ref[0, row] = jnp.where(valid, part, -1).astype(
                jnp.int8)

        def warm_body(t, _):
            step(t, B1, B1, warm_width, wpar_ref, wprt_ref, t)
            return 0

        jax.lax.fori_loop(0, T1, warm_body, 0)

        # Transition: B1 slots -> W slots (read index T1, record row 0).
        step(jnp.int32(T1), B1, W, W, mpar_ref, mprt_ref, 0)

        def main_body(t, _):
            step(t, W, W, W, mpar_ref, mprt_ref, t - T1)
            return 0

        jax.lax.fori_loop(T1 + 1, R, main_body, 0)

        final = score_ref[0, 0:W]
        sc_ref[0, 0, :] = final
        lv_ref[0, 0, :] = jnp.isfinite(final).astype(jnp.int8)

    return kernel


@functools.partial(jax.jit, static_argnames=("max_ploidy", "beam_width",
                                             "max_alleles", "dedup",
                                             "interpret"))
def beam_search_batch_pallas(alleles, weights, num_reads, epsilon,
                             num_parts, max_ploidy: int,
                             beam_width: int,
                             max_alleles: int = constants.MAX_ALLELES,
                             dedup: bool = True,
                             interpret: bool = False):
    """Drop-in twin of beam_search_batch_mixed (full-S window) running
    the scan as ONE Pallas kernel per instance with all state in VMEM.
    Requires R > BEAM_WARMUP_READS and max_ploidy*beam_width <= 127
    (int8 traceback records); callers fall back to the XLA impl
    otherwise (see supports_shape)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, R, S = alleles.shape
    P = max_ploidy
    A = max_alleles
    W = beam_width
    B1 = P * W
    T1 = min(constants.BEAM_WARMUP_READS, R)
    assert R > T1 and B1 <= 127
    T2 = R - T1

    eps = epsilon.astype(jnp.float32)
    hs_np, gs_np = beam_x._hash_consts_np(A, S, P)
    vs = [jnp.asarray(h) for h in hs_np]

    def _zrows(alleles_g, weights_g):
        oh_all = (alleles_g[:, None, :]
                  == jnp.arange(A, dtype=alleles_g.dtype)[
                      None, :, None]).astype(jnp.float32)
        starts = beam_x._read_starts(alleles_g >= 0, S)
        return tuple(
            beam_x._suffix_hash(weights_g, oh_all, v)[starts]
            for v in vs)                                      # [R, R]

    z0, z1 = jax.vmap(_zrows)(alleles, weights)

    kernel = _make_kernel(R, S, P, W, A, T1, gs_np, dedup)

    vmem3 = lambda d1, d2: pl.BlockSpec((1, d1, d2),
                                        lambda g, *_: (g, 0, 0),
                                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[vmem3(R, S), vmem3(R, S), vmem3(R, R), vmem3(R, R),
                  pl.BlockSpec((1, P), lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P), lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(vmem3(T1, B1), vmem3(T1, B1),
                   vmem3(T2, W), vmem3(T2, W),
                   vmem3(1, W), vmem3(1, W)),
        scratch_shapes=[
            pltpu.VMEM((B1, P, A, S), jnp.float32),
            pltpu.VMEM((B1, P, R), jnp.float32),
            pltpu.VMEM((1, B1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, T1, B1), jnp.int8),
            jax.ShapeDtypeStruct((G, T1, B1), jnp.int8),
            jax.ShapeDtypeStruct((G, T2, W), jnp.int8),
            jax.ShapeDtypeStruct((G, T2, W), jnp.int8),
            jax.ShapeDtypeStruct((G, 1, W), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, W), jnp.int8),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
    )(num_reads.astype(jnp.int32), eps, num_parts.astype(jnp.int32),
      alleles, weights, z0, z1,
      jnp.asarray(gs_np[0]).reshape(1, P),
      jnp.asarray(gs_np[1]).reshape(1, P))
    wpar, wprt, mpar, mprt, scores, live = out
    return beam_x.BeamResult(wpar, wprt, mpar, mprt,
                             scores.reshape(G, W),
                             live.reshape(G, W).astype(bool))


def supports_shape(R: int, max_ploidy: int, beam_width: int) -> bool:
    """True when the Pallas path handles this dispatch (the XLA impl
    remains the fallback and the spec)."""
    return (R > constants.BEAM_WARMUP_READS
            and max_ploidy * beam_width <= 127)
