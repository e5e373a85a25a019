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

ROUND-5 ABLATION STATUS (kept as a documented experiment, not
production): the round-4 blocker "summation order pins f32 rounding"
is GONE — the exact-arithmetic rework makes every comparison-feeding
sum an order-free integer — but a new, harder blocker replaced it:
the binomial-tail / log-sum-exp prune is computed in f64 on [B, P]
(the only transcendental in the scan), and Mosaic has no f64 support
(probed on v5e this round: remote compile rejects f64 kernels). A
Pallas scan computing that part in f32 would break the pinned
TPU==CPU byte-identity of outputs. Production instead adopted the
impl="planes" XLA kernel (beam.py _step_planes): count planes carried
as persistent state, 1.4x the exact-hist path at the real e2e shape.
This file's interpret-mode equality tests still pin the round-4
semantics it implements (pre-planes counts layout).
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


def _iota_col(n, dtype=jnp.int32):
    """[n, 1] column iota (bool minor-dim reshapes are unsupported in
    Mosaic, so 2D masks are built directly from 2D iotas)."""
    return jax.lax.broadcasted_iota(dtype, (n, 1), 0)


def _rank_select_2d(cand, out_slots):
    """kernels/beam.py:_rank_select in all-2D form (Mosaic's layout
    engine rejects rank-1 vectors, 2D->1D flattens, and multi-dim minor
    insertions): the pairwise (score asc, generation asc) ranking runs
    as a static (pi, pj) loop of [B, B] compares; generation order is
    the flattened index b*P + p, identical to the XLA version.

    Returns (sel_score [out,1], gather_oh [out,B], part_oh [out,P],
    parent [out,1] i32, part [out,1] i32)."""
    B, P = cand.shape
    flat = jnp.minimum(cand, _BIG)                       # [B, P]
    prow = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    rank = jnp.zeros((B, P), jnp.int32)
    gi = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)  # row = i
    gj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)  # col = j
    flat_t = flat.T                                      # [P, B]
    for pi in range(P):
        fp = flat[:, pi:pi + 1]                          # [B, 1]
        cnt = jnp.zeros((B, 1), jnp.int32)
        for pj in range(P):
            fq = flat_t[pj:pj + 1, :]                    # [1, B]
            less = ((fq < fp)
                    | ((fq == fp)
                       & (gj * P + pj < gi * P + pi)))   # [B, B]
            cnt = cnt + less.sum(axis=1, keepdims=True)
        rank = jnp.where(prow == pi, cnt, rank)
    sel = (rank[None] == jax.lax.broadcasted_iota(
        jnp.int32, (out_slots, B, P), 0)).astype(jnp.float32)
    sel_score = (sel * flat[None]).sum(axis=2).sum(
        axis=1, keepdims=True)                           # [out, 1]
    gather_oh = sel.sum(-1)                              # [out, B]
    part_oh = sel.sum(-2)                                # [out, P]
    parent = (gather_oh * jax.lax.broadcasted_iota(
        jnp.int32, (out_slots, B), 1).astype(jnp.float32)).sum(
        axis=1, keepdims=True).astype(jnp.int32)         # [out, 1]
    part = (part_oh * jax.lax.broadcasted_iota(
        jnp.int32, (out_slots, P), 1).astype(jnp.float32)).sum(
        axis=1, keepdims=True).astype(jnp.int32)         # [out, 1]
    return sel_score, gather_oh, part_oh, parent, part


def _dedup_mask(cand, h_cols):
    """[B, P] int32 (nonzero = duplicate to kill), exactly the XLA
    dedup rule: candidate i dies when an earlier-generation j has all
    fingerprints equal, is finite, and scores >= i. h_cols: per
    fingerprint, a list of P [B, 1] columns."""
    B, P = cand.shape
    prow = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    fin = jnp.isfinite(cand).astype(jnp.float32)         # [B, P]
    fin_t = fin.T
    cand_t = cand.T
    gi = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    dup = jnp.zeros((B, P), jnp.int32)
    for pi in range(P):
        acc = jnp.zeros((B, 1), jnp.int32)
        cp = cand[:, pi:pi + 1]                          # [B, 1]
        for pj in range(P):
            eq = functools.reduce(
                jnp.logical_and,
                [(cols[pj].T == cols[pi]) for cols in h_cols])
            m = (eq
                 & (gj * P + pj < gi * P + pi)
                 & (fin_t[pj:pj + 1, :] > 0)
                 & (cand_t[pj:pj + 1, :] >= cp))
            acc = acc + m.sum(axis=1, keepdims=True)
        dup = jnp.where(prow == pi, acc, dup)
    return dup


def _make_kernel(R, S, P, W, A, T1, gs_np, dedup):
    """Build the kernel body for one (shape, ploidy, beam) variant.

    Written in all-2D form around Mosaic's constraints: dynamic sublane
    indices must be provably 8-aligned (per-read rows load as aligned
    8-row blocks with a one-hot row select — exact, the selects add
    zeros); rank-1 vectors / 2D->1D flattens / multi-dim minor
    insertions are unsupported (everything is a [X, 1] column, a
    [1, X] row, or a static per-(part, allele) plane loop); traceback
    records accumulate transposed in scratch and are emitted once at
    the end. R must be a multiple of 8 (the wrapper pads)."""
    import math

    from jax.experimental import pallas as pl

    B1 = P * W
    T2 = R - T1
    cutoff = float(math.log(constants.PROB_CUTOFF))
    div = float(constants.DIV_FACTOR)

    def kernel(nr_ref, eps_ref, np_ref, alleles_ref, weights_ref,
               z0_ref, z1_ref, g0_ref, g1_ref,
               wpar_ref, wprt_ref, mpar_ref, mprt_ref, sc_ref, lv_ref,
               counts_ref, hist_ref, score_ref,
               wpar_s, wprt_s, mpar_s, mprt_s):
        g = pl.program_id(0)
        nr = nr_ref[g]
        eps = eps_ref[g]
        nparts = np_ref[g]
        part_active = jax.lax.broadcasted_iota(
            jnp.int32, (1, P), 1) < nparts                # [1, P]
        warm_width = nparts * W

        # Reset persistent scratch (grid steps share it).
        counts_ref[...] = jnp.zeros((B1, P, A, S), jnp.float32)
        hist_ref[...] = jnp.zeros((B1, P, R), jnp.float32)
        score_ref[...] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (B1, 1), 0) == 0,
            0.0, _INF).astype(jnp.float32)

        def _row8(ref, t):
            """ref[0, t, :] as a [1, S] row via an aligned 8-row block
            load + a one-hot row-select (dynamic sublane indices must
            be provably 8-aligned)."""
            t8 = pl.multiple_of((t // 8) * 8, 8)
            m8c = jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0) == (t - t8)         # [8, 1]
            blk = ref[0, pl.ds(t8, 8), :]
            return m8c, blk

        def step(t, B_in, out_slots, width, par_s, prt_s, n_rows, row):
            valid = t < nr
            m8c, al_blk = _row8(alleles_ref, t)
            al_t = jnp.where(m8c, al_blk.astype(jnp.int32),
                             -128).max(axis=0, keepdims=True)  # [1, S]
            _, w_blk = _row8(weights_ref, t)
            w_t = jnp.where(m8c, w_blk, 0.0).sum(
                axis=0, keepdims=True)                    # [1, S]
            a_cov = al_t >= 0                             # [1, S]

            score = score_ref[0:B_in]                     # [B, 1]
            live = jnp.isfinite(score)                    # [B, 1]

            # Scoring per (part, allele) plane, all-2D.
            same = jnp.zeros((B_in, P), jnp.float32)
            diff = jnp.zeros((B_in, P), jnp.float32)
            prow = jax.lax.broadcasted_iota(
                jnp.int32, (B_in, P), 1)
            eps_empty = eps * (a_cov.astype(jnp.float32)).sum()
            for pi in range(P):
                planes = [counts_ref[0:B_in, pi, a, :]
                          for a in range(A)]              # A x [B, S]
                maxc = planes[0]
                for a in range(1, A):
                    maxc = jnp.maximum(maxc, planes[a])
                at = jnp.zeros((B_in, S), jnp.float32)
                for a in range(A):
                    at = at + planes[a] * (al_t == a).astype(
                        jnp.float32)
                empty = maxc == 0.0
                nonempty_cov = a_cov & ~empty             # [B, S]
                same_p = (w_t * (nonempty_cov
                                 & (at == maxc))).sum(
                    axis=1, keepdims=True)                # [B, 1]
                diff_p = ((w_t * (nonempty_cov
                                  & (at < maxc))).sum(
                    axis=1, keepdims=True)
                    + eps * (a_cov & empty).astype(
                        jnp.float32).sum(axis=1, keepdims=True))
                same = jnp.where(prow == pi, same_p, same)
                diff = jnp.where(prow == pi, diff_p, diff)
            del eps_empty
            pval = binom_tail_jnp(same + diff, diff, eps, div)
            pval = jnp.where(part_active, pval, -_INF)    # [B, P]
            m = pval.max(axis=-1, keepdims=True)
            lse = m + jnp.log(jnp.exp(pval - m).sum(axis=-1,
                                                    keepdims=True))
            keep = ((pval - lse) > cutoff) & part_active
            cand = jnp.where(keep & live, score + diff, _INF)

            if dedup:
                # Fingerprint arithmetic runs in WRAPPING int32 (Mosaic
                # lacks unsigned reductions): two's-complement add/mul
                # are bit-identical to the uint32 mod-2^32 math of the
                # XLA impl, and equality compares the same bits.
                tsel = jax.lax.broadcasted_iota(
                    jnp.int32, (1, R), 1) == t            # [1, R]
                h_cols = []
                for z_ref, g_ref in ((z0_ref, g0_ref),
                                     (z1_ref, g1_ref)):
                    _, z_blk = _row8(z_ref, t)
                    zt = jnp.where(m8c, z_blk, 0).sum(
                        axis=0, keepdims=True,
                        dtype=jnp.int32)                  # [1, R]
                    rc = jnp.where(tsel, zt, 0).sum(
                        dtype=jnp.int32)                  # scalar
                    phs = []                              # P x [B, 1]
                    for pi in range(P):
                        hp = hist_ref[0:B_in, pi, :]      # [B, R]
                        phs.append(jnp.where(hp != 0, zt, 0).sum(
                            axis=1, keepdims=True, dtype=jnp.int32))
                    hsum = jnp.zeros((B_in, 1), jnp.int32)
                    for pi in range(P):
                        hsum = hsum + phs[pi] * g_ref[0, pi]
                    h_cols.append([hsum + g_ref[0, pi] * rc
                                   for pi in range(P)])
                cand = jnp.where(_dedup_mask(cand, h_cols) > 0,
                                 _INF, cand)

            sel_score, gather_oh, part_oh, parent, part = \
                _rank_select_2d(cand, out_slots)
            new_live = ((jax.lax.broadcasted_iota(
                jnp.int32, (out_slots, 1), 0) < width)
                & (sel_score < _BIG_CUT))                 # [out, 1]
            new_score = jnp.where(new_live, sel_score, _INF)

            # Per-plane one-hot permutation + update: exact copies plus
            # exact +0 adds, identical to the XLA one-hot matmul; each
            # plane's write only overwrites rows its own (materialized)
            # dot already consumed.
            t_oh = tsel.astype(jnp.float32) if dedup else (
                jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
                == t).astype(jnp.float32)                 # [1, R]
            for pi in range(P):
                pcol = part_oh[:, pi:pi + 1]              # [out, 1]
                for a in range(A):
                    plane = counts_ref[0:B_in, pi, a, :]  # [B, S]
                    neww = jnp.dot(
                        gather_oh, plane,
                        preferred_element_type=jnp.float32)
                    upd = w_t * (al_t == a).astype(jnp.float32)
                    neww = neww + pcol * upd
                    counts_ref[0:out_slots, pi, a, :] = jnp.where(
                        valid, neww, counts_ref[0:out_slots, pi, a, :])
                hp = hist_ref[0:B_in, pi, :]              # [B, R]
                newh = jnp.dot(gather_oh, hp,
                               preferred_element_type=jnp.float32)
                newh = newh + pcol * t_oh
                hist_ref[0:out_slots, pi, :] = jnp.where(
                    valid, newh, hist_ref[0:out_slots, pi, :])

            score_ref[0:out_slots] = jnp.where(
                valid, new_score, score_ref[0:out_slots])
            # Records accumulate TRANSPOSED ([slots, rows]) via a
            # whole-array column select; emitted once at kernel end.
            csel = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_rows), 1) == row
            rec_par = jnp.where(
                valid, parent,
                jax.lax.broadcasted_iota(jnp.int32, (out_slots, 1),
                                         0))              # [out, 1]
            rec_prt = jnp.where(valid, part, -1)
            par_s[0:out_slots] = jnp.where(csel, rec_par,
                                           par_s[0:out_slots])
            prt_s[0:out_slots] = jnp.where(csel, rec_prt,
                                           prt_s[0:out_slots])

        def warm_body(t, _):
            step(t, B1, B1, warm_width, wpar_s, wprt_s, T1, t)
            return 0

        jax.lax.fori_loop(0, T1, warm_body, 0)

        # Transition: B1 slots -> W slots (read index T1, record row 0).
        step(jnp.int32(T1), B1, W, W, mpar_s, mprt_s, T2, 0)

        def main_body(t, _):
            step(t, W, W, W, mpar_s, mprt_s, T2, t - T1)
            return 0

        jax.lax.fori_loop(T1 + 1, R, main_body, 0)

        wpar_ref[0] = wpar_s[...].astype(jnp.int8)
        wprt_ref[0] = wprt_s[...].astype(jnp.int8)
        mpar_ref[0] = mpar_s[...].astype(jnp.int8)
        mprt_ref[0] = mprt_s[...].astype(jnp.int8)
        final = score_ref[0:W]                            # [W, 1]
        sc_ref[0] = final
        lv_ref[0] = jnp.isfinite(final).astype(jnp.int8)

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
    # Pad the read axis to a multiple of 8 (aligned block loads in the
    # kernel); padded steps are invalid (t >= num_reads) so state and
    # records pass through them untouched, exactly like XLA's padding
    # rows.
    R8 = (R + 7) & ~7
    if R8 != R:
        alleles = jnp.pad(alleles, ((0, 0), (0, R8 - R), (0, 0)),
                          constant_values=-1)
        weights = jnp.pad(weights, ((0, 0), (0, R8 - R), (0, 0)))
    R = R8
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
    # Wrapping-int32 view: bit-identical arithmetic, Mosaic-reducible.
    z0 = jax.lax.bitcast_convert_type(z0, jnp.int32)
    z1 = jax.lax.bitcast_convert_type(z1, jnp.int32)

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
        out_specs=(vmem3(B1, T1), vmem3(B1, T1),
                   vmem3(W, T2), vmem3(W, T2),
                   vmem3(W, 1), vmem3(W, 1)),
        scratch_shapes=[
            pltpu.VMEM((B1, P, A, S), jnp.float32),
            pltpu.VMEM((B1, P, R), jnp.float32),
            pltpu.VMEM((B1, 1), jnp.float32),
            pltpu.VMEM((B1, T1), jnp.int32),
            pltpu.VMEM((B1, T1), jnp.int32),
            pltpu.VMEM((W, T2), jnp.int32),
            pltpu.VMEM((W, T2), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((G, B1, T1), jnp.int8),
            jax.ShapeDtypeStruct((G, B1, T1), jnp.int8),
            jax.ShapeDtypeStruct((G, W, T2), jnp.int8),
            jax.ShapeDtypeStruct((G, W, T2), jnp.int8),
            jax.ShapeDtypeStruct((G, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, W, 1), jnp.int8),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
    )(num_reads.astype(jnp.int32), eps, num_parts.astype(jnp.int32),
      alleles, weights, z0, z1,
      jnp.asarray(gs_np[0].view(np.int32)).reshape(1, P),
      jnp.asarray(gs_np[1].view(np.int32)).reshape(1, P))
    wpar, wprt, mpar, mprt, scores, live = out
    # Records come out [slots, rows] (kernel-internal layout);
    # transpose to the BeamResult convention outside the kernel.
    return beam_x.BeamResult(
        wpar.transpose(0, 2, 1), wprt.transpose(0, 2, 1),
        mpar.transpose(0, 2, 1), mprt.transpose(0, 2, 1),
        scores.reshape(G, W), live.reshape(G, W).astype(bool))


def supports_shape(R: int, max_ploidy: int, beam_width: int) -> bool:
    """True when the Pallas path handles this dispatch (the XLA impl
    remains the fallback and the spec)."""
    return (R > constants.BEAM_WARMUP_READS
            and max_ploidy * beam_width <= 127)
