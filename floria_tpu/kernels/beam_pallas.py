"""Pallas TPU beam-search kernel: VMEM-resident scan.

The XLA scan in beam.py round-trips the beam count state through HBM on
every read insertion. This kernel keeps the whole state — counts
[C, B, P*A, S], scores, liveness — in VMEM scratch for the entire scan,
so each step touches only on-chip memory; per-step HBM traffic drops to
the one read row. The grid walks chunks of C block instances; the math is
identical to beam.py (same candidate scoring, same two-phase beam
widths, same tie-breaks), and tests assert equality between the two
kernels.

In-kernel top-k is an iterative extract-min (argmin + mask), which
matches lax.top_k's lowest-index-first tie order. The beam gather is a
one-hot MXU matmul per instance.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from .beam import BeamResult
from .scores import binom_tail_jnp, log_sum_exp_jnp

NEG_SET = jnp.float32(jnp.inf)

# VMEM budget for choosing the instance-chunk size (bytes).
_VMEM_BUDGET = 10 * 1024 * 1024


def chunk_for(ploidy: int, beam_width: int, R: int, S: int,
              max_alleles: int = constants.MAX_ALLELES) -> int:
    """Largest C whose scratch + inputs fit the VMEM budget."""
    B1 = ploidy * beam_width
    per_instance = (
        B1 * ploidy * max_alleles * S * 4       # counts scratch
        + R * S * (1 + 4)                       # alleles + weights
        + R * B1 * 8                            # traceback outputs
        + 64 * 1024)                            # slack
    c = max(1, _VMEM_BUDGET // per_instance)
    return int(min(c, 8))


def supported(R: int, S: int, ploidy: int, beam_width: int) -> bool:
    return (chunk_for(ploidy, beam_width, R, S) >= 1 and S % 128 == 0
            and R > constants.BEAM_WARMUP_READS)


@functools.partial(jax.jit, static_argnames=("ploidy", "beam_width",
                                             "max_alleles", "interpret"))
def beam_search_batch_pallas(alleles: jax.Array, weights: jax.Array,
                             num_reads: jax.Array, epsilon: jax.Array,
                             ploidy: int, beam_width: int,
                             max_alleles: int = constants.MAX_ALLELES,
                             interpret: bool = False) -> BeamResult:
    """Drop-in replacement for beam.beam_search_batch."""
    G, R, S = alleles.shape
    P = ploidy
    A = max_alleles
    B1 = P * beam_width
    W = beam_width
    T1 = min(constants.BEAM_WARMUP_READS, R)
    T2 = R - T1 - 1 if R > T1 else 0
    C = chunk_for(ploidy, beam_width, R, S, A)
    G_pad = ((G + C - 1) // C) * C
    if G_pad != G:
        pad = G_pad - G
        alleles = jnp.concatenate(
            [alleles, jnp.full((pad, R, S), -1, alleles.dtype)])
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad, R, S), weights.dtype)])
        num_reads = jnp.concatenate(
            [num_reads, jnp.zeros(pad, num_reads.dtype)])
        epsilon = jnp.concatenate(
            [epsilon, jnp.full(pad, 0.01, epsilon.dtype)])

    kernel = functools.partial(_scan_kernel, ploidy=P, beam_width=W,
                               max_alleles=A, T1=T1, R=R, C=C)
    grid = (G_pad // C,)
    # Time-major layouts so every dynamic index lands on the leading
    # (untiled) dimension — Mosaic requires tiled-dim indices to be
    # static multiples of the sublane count.
    alleles_t = jnp.swapaxes(alleles, 0, 1)            # [R, G, S]
    weights_t = jnp.swapaxes(weights, 0, 1)
    spec_reads = pl.BlockSpec((R, C, S), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    spec_scalar = pl.BlockSpec((C, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    TM = T2 + (1 if R > T1 else 0)
    BF = W if R > T1 else B1
    out_shapes = (
        jax.ShapeDtypeStruct((T1, G_pad, B1), jnp.int32),      # warm par
        jax.ShapeDtypeStruct((T1, G_pad, B1), jnp.int32),      # warm part
        jax.ShapeDtypeStruct((TM, G_pad, W), jnp.int32),       # main par
        jax.ShapeDtypeStruct((TM, G_pad, W), jnp.int32),       # main part
        jax.ShapeDtypeStruct((G_pad, BF), jnp.float32),        # scores
        jax.ShapeDtypeStruct((G_pad, BF), jnp.int32),          # live
    )
    out_specs = (
        pl.BlockSpec((T1, C, B1), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T1, C, B1), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, C, W), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, C, W), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, BF), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, BF), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_reads, spec_reads, spec_scalar, spec_scalar],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((C, B1, P * A, S), jnp.float32),  # counts
            pltpu.VMEM((C, B1), jnp.float32),            # scores
        ],
        interpret=interpret,
    )(alleles_t, weights_t, num_reads.astype(jnp.int32).reshape(-1, 1),
      epsilon.astype(jnp.float32).reshape(-1, 1))
    wpar, wpart, mpar, mpart, scores, live = outs
    wpar = jnp.swapaxes(wpar, 0, 1)
    wpart = jnp.swapaxes(wpart, 0, 1)
    mpar = jnp.swapaxes(mpar, 0, 1)
    mpart = jnp.swapaxes(mpart, 0, 1)
    return BeamResult(wpar[:G], wpart[:G], mpar[:G], mpart[:G],
                      scores[:G], live[:G].astype(bool))


def _scan_kernel(alleles_ref, weights_ref, nr_ref, eps_ref,
                 wpar_ref, wpart_ref, mpar_ref, mpart_ref, scores_ref,
                 live_ref, counts_ref, score_ref, *, ploidy, beam_width,
                 max_alleles, T1, R, C):
    P = ploidy
    A = max_alleles
    B1 = P * beam_width
    W = beam_width
    S = alleles_ref.shape[-1]
    cutoff = jnp.float32(math.log(constants.PROB_CUTOFF))
    div = jnp.float32(constants.DIV_FACTOR)

    nr = nr_ref[:, 0].reshape(C, 1)                    # [C, 1] int32
    eps = eps_ref[:, 0].reshape(C, 1)                  # [C, 1] f32

    counts_ref[...] = jnp.zeros_like(counts_ref)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (C, B1), 1)
    score_ref[...] = jnp.where(slot_ids == 0, 0.0, jnp.inf)

    def do_step(t, B, out_slots, width):
        """One read insertion on the first B slots; returns
        (parent [C, out_slots], part [C, out_slots])."""
        counts = counts_ref[:, :B, :, :]               # [C, B, P*A, S]
        score = score_ref[:, :B]                       # [C, B]
        live = jnp.isfinite(score)
        a_t = alleles_ref[t, :, :]                     # [C, S] int8
        w_t = weights_ref[t, :, :]                     # [C, S] f32
        valid = (t < nr)                               # [C, 1]

        # Mask logic in f32 arithmetic: Mosaic cannot reshape i1
        # vectors through unit dims.
        cnt4 = counts.reshape(C, B, P, A, S)
        maxc = cnt4.max(axis=3)                        # [C, B, P, S]
        ai = a_t.astype(jnp.int32)
        oh_t = (ai[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (C, A, S), 1)).astype(jnp.float32)  # [C, A, S]
        at = (cnt4 * oh_t[:, None, None]).sum(axis=3)  # [C, B, P, S]
        covf = (ai >= 0).astype(jnp.float32)           # [C, S]
        wcov = (w_t * covf)[:, None, None, :]          # [C, 1, 1, S]
        emptyf = (maxc == 0.0).astype(jnp.float32)     # [C, B, P, S]
        nonempty = 1.0 - emptyf
        eqf = (at == maxc).astype(jnp.float32)
        ltf = (at < maxc).astype(jnp.float32)
        same = (wcov * nonempty * eqf).sum(-1)         # [C, B, P]
        diff = ((wcov * nonempty * ltf).sum(-1)
                + eps[:, :, None]
                * (covf[:, None, None, :] * emptyf).sum(-1))
        pval = binom_tail_jnp(same + diff, diff, eps[:, :, None], div)
        lse = log_sum_exp_jnp(pval, axis=-1)           # [C, B]
        keepf = ((pval - lse[:, :, None]) > cutoff).astype(jnp.float32)
        livef = live.astype(jnp.float32)
        okf = keepf * livef[:, :, None]
        cand = jnp.where(okf > 0.0, score[:, :, None] + diff, jnp.inf)

        flat = cand.reshape(C, B * P)
        # Iterative extract-min top-k (ties -> lowest index, like top_k).
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, B * P), 1)

        kcols = jax.lax.broadcasted_iota(jnp.int32, (C, out_slots), 1)

        def pick(k, carry):
            # One-hot column writes — Mosaic has no scatter lowering.
            flat_c, parents, parts, sels = carry
            idx = jnp.argmin(flat_c, axis=1)           # [C]
            m = jnp.min(flat_c, axis=1)
            kcol = kcols == k
            parents = jnp.where(kcol,
                                (idx // P)[:, None].astype(jnp.int32),
                                parents)
            parts = jnp.where(kcol,
                              (idx % P)[:, None].astype(jnp.int32),
                              parts)
            sels = jnp.where(kcol, m[:, None], sels)
            flat_c = jnp.where(lane == idx[:, None], jnp.inf, flat_c)
            return flat_c, parents, parts, sels

        parents0 = jnp.zeros((C, out_slots), jnp.int32)
        parts0 = jnp.zeros((C, out_slots), jnp.int32)
        sels0 = jnp.full((C, out_slots), jnp.inf, jnp.float32)
        _flat, parents, parts, sels = jax.lax.fori_loop(
            0, out_slots, pick, (flat, parents0, parts0, sels0))

        rank = jax.lax.broadcasted_iota(jnp.int32, (C, out_slots), 1)
        new_live = (rank < width) & jnp.isfinite(sels)
        new_score = jnp.where(new_live, sels, jnp.inf)

        # newc[c, b'] = counts[c, parent[b']] + update on part[b']
        flatc = counts.reshape(C, B, P * A * S)
        update = ((w_t * covf)[:, None, :] * oh_t).reshape(C, 1, A * S)
        newc_list = []
        for c in range(C):
            g_oh = (parents[c][:, None]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (out_slots, B), 1)).astype(jnp.float32)
            newc_list.append(jax.lax.dot_general(
                g_oh, flatc[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        newc = jnp.stack(newc_list).reshape(C, out_slots, P, A * S)
        part_oh = (parts[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (C, out_slots, P), 2)).astype(jnp.float32)
        newc = newc + part_oh[..., None] * update[:, :, None, :]
        newc = newc.reshape(C, out_slots, P * A, S)

        validf = valid.astype(jnp.float32)             # [C, 1]
        vf4 = validf.reshape(C, 1, 1, 1)
        counts_ref[:, :out_slots] = (
            vf4 * newc + (1.0 - vf4) * counts_ref[:, :out_slots, :, :])
        score_ref[:, :out_slots] = jnp.where(
            valid, new_score, score_ref[:, :out_slots])
        out_parent = jnp.where(valid, parents,
                               jax.lax.broadcasted_iota(
                                   jnp.int32, (C, out_slots), 1))
        out_part = jnp.where(valid, parts, -1)
        return out_parent, out_part

    def warm_body(t, _):
        parent, part = do_step(t, B1, B1, B1)
        wpar_ref[t, :, :] = parent
        wpart_ref[t, :, :] = part
        return 0

    jax.lax.fori_loop(0, T1, warm_body, 0)

    if R > T1:
        parent, part = do_step(T1, B1, W, W)
        mpar_ref[0, :, :] = parent
        mpart_ref[0, :, :] = part
        # Dead tail slots: make sure they can never be selected.
        score_ref[:, W:] = jnp.full_like(score_ref[:, W:], jnp.inf)

        def main_body(t, _):
            parent, part = do_step(t, W, W, W)
            mpar_ref[t - T1, :, :] = parent
            mpart_ref[t - T1, :, :] = part
            return 0

        jax.lax.fori_loop(T1 + 1, R, main_body, 0)
        scores_ref[...] = score_ref[:, :W]
        live_ref[...] = jnp.isfinite(score_ref[:, :W]).astype(jnp.int32)
    else:
        scores_ref[...] = score_ref[...]
        live_ref[...] = jnp.isfinite(score_ref[...]).astype(jnp.int32)
