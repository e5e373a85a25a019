"""Pallas TPU beam-search kernel: VMEM-resident main-phase scan.

STATUS: experimental, not wired into the default dispatch. On a v5e the
P=2 variant compiles and matches the XLA kernel bit-for-bit on final
scores but shows no wall-clock gain (the step is op-count-bound, not
HBM-bound, at these beam sizes), and the P=5 variant crashes the Mosaic
compiler without diagnostics. Kept as the starting point for future
kernel work; interpret-mode tests pin its semantics to beam.py.

The XLA scan in beam.py round-trips the beam count state through HBM on
every read insertion. This module keeps the post-warmup state — counts
[C, W*P*A, S] and scores — in VMEM scratch for the whole main phase (~90%
of the reads), so each step touches only on-chip memory. The warm phase
(25 reads at ploidy*W beam slots) and the width transition stay in the
XLA kernel (beam.warmup_state_batch); this kernel continues from the
handed-over state. Math, widths, and tie-breaks are identical to beam.py
and tests assert semantic equality between the two paths.

Mosaic shape rules honored here: all refs are rank <= 3 with the last two
dims (W*P*A, S) / (C, 128) tile-aligned; every dynamic index lands on a
leading (untiled) dimension; per-instance scalars (num_reads, epsilon)
travel as 128-lane replicated f32 rows; in-kernel top-k is an iterative
extract-min, matching lax.top_k's lowest-index-first tie order.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from .beam import BeamResult, warmup_state_batch
from .scores import binom_tail_jnp, log_sum_exp_jnp

# Instance chunk per grid program. 8 = f32 sublane count, the minimum
# that keeps (C, x) output blocks tile-legal.
CHUNK = 8

_LANES = 128


def supported(R: int, S: int, ploidy: int, beam_width: int,
              max_alleles: int = constants.MAX_ALLELES) -> bool:
    if S % _LANES != 0 or R <= constants.BEAM_WARMUP_READS:
        return False
    if beam_width > _LANES:
        return False
    W, P, A = beam_width, ploidy, max_alleles
    state = CHUNK * W * P * A * S * 4
    reads = (R - constants.BEAM_WARMUP_READS) * CHUNK * S * 5
    return state + 2 * reads < 9 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("ploidy", "beam_width",
                                             "max_alleles", "interpret"))
def beam_search_batch_pallas(alleles: jax.Array, weights: jax.Array,
                             num_reads: jax.Array, epsilon: jax.Array,
                             ploidy: int, beam_width: int,
                             max_alleles: int = constants.MAX_ALLELES,
                             interpret: bool = False) -> BeamResult:
    """Drop-in replacement for beam.beam_search_batch (hybrid XLA warmup
    + Pallas main scan). Requires supported(R, S, ploidy, beam_width)."""
    G, R, S = alleles.shape
    P, A, W = ploidy, max_alleles, beam_width
    T1 = constants.BEAM_WARMUP_READS
    assert R > T1, "use beam.beam_search_batch for warmup-only blocks"

    counts, score, wpar, wpart, tr_parent, tr_part = warmup_state_batch(
        alleles, weights, num_reads, epsilon, ploidy, beam_width,
        max_alleles)

    G_pad = ((G + CHUNK - 1) // CHUNK) * CHUNK
    if G_pad != G:
        pad = G_pad - G
        counts = jnp.concatenate(
            [counts, jnp.zeros((pad,) + counts.shape[1:], counts.dtype)])
        score = jnp.concatenate(
            [score, jnp.full((pad, W), jnp.inf, score.dtype)])
        alleles = jnp.concatenate(
            [alleles, jnp.full((pad, R, S), -1, alleles.dtype)])
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad, R, S), weights.dtype)])
        num_reads = jnp.concatenate(
            [num_reads, jnp.zeros(pad, num_reads.dtype)])
        epsilon = jnp.concatenate(
            [epsilon, jnp.full(pad, 0.01, epsilon.dtype)])

    T2 = R - T1 - 1
    counts3 = counts.reshape(G_pad, W * P * A, S)
    nr_w = jnp.broadcast_to(
        num_reads.astype(jnp.float32)[:, None], (G_pad, W))
    eps_w = jnp.broadcast_to(
        epsilon.astype(jnp.float32)[:, None], (G_pad, W))
    alleles_t = jnp.swapaxes(alleles[:, T1 + 1:], 0, 1)  # [T2, G, S]
    weights_t = jnp.swapaxes(weights[:, T1 + 1:], 0, 1)

    kernel = functools.partial(_main_kernel, ploidy=P, beam_width=W,
                               max_alleles=A, T1=T1, T2=T2)
    grid = (G_pad // CHUNK,)
    mpar_t, mpart_t, score_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T2, CHUNK, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, CHUNK, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W * P * A, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T2, CHUNK, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T2, CHUNK, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T2, G_pad, W), jnp.int32),
            jax.ShapeDtypeStruct((T2, G_pad, W), jnp.int32),
            jax.ShapeDtypeStruct((G_pad, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, W * P * A, S), jnp.float32),
            pltpu.VMEM((CHUNK, W), jnp.float32),
        ],
        interpret=interpret,
    )(alleles_t, weights_t, counts3, score, nr_w, eps_w)

    mpar = jnp.swapaxes(mpar_t, 0, 1)                    # [G, T2, W]
    mpart = jnp.swapaxes(mpart_t, 0, 1)
    main_parents = jnp.concatenate([tr_parent[:, None, :], mpar[:G]],
                                   axis=1)
    main_parts = jnp.concatenate([tr_part[:, None, :], mpart[:G]],
                                 axis=1)
    final_score = score_out[:G]
    live = jnp.isfinite(final_score)
    return BeamResult(wpar[:G], wpart[:G], main_parents, main_parts,
                      final_score, live)


def _main_kernel(alleles_ref, weights_ref, counts0_ref, score0_ref,
                 nr_ref, eps_ref, mpar_ref, mpart_ref, score_out_ref,
                 counts_ref, score_ref, *, ploidy, beam_width,
                 max_alleles, T1, T2):
    P, A, W = ploidy, max_alleles, beam_width
    C = CHUNK
    S = alleles_ref.shape[-1]
    cutoff = jnp.float32(math.log(constants.PROB_CUTOFF))
    div = jnp.float32(constants.DIV_FACTOR)

    counts_ref[...] = counts0_ref[...]
    score_ref[...] = score0_ref[...]
    nr = nr_ref[...]                                    # [C, W] f32
    eps_w = eps_ref[...]                                # [C, W] f32
    lane_wp = jax.lax.broadcasted_iota(jnp.int32, (C, W * P), 1)
    rank_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)

    def step(t, _):
        counts = counts_ref[...]                        # [C, WPA, S]
        score = score_ref[...]                          # [C, W]
        live = jnp.isfinite(score)
        a_t = alleles_ref[t, :, :].astype(jnp.int32)    # [C, S]
        w_t = weights_ref[t, :, :]                      # [C, S]
        t_abs = (t + T1 + 1).astype(jnp.float32)
        validf = (t_abs < nr).astype(jnp.float32)       # [C, W] 0/1
        valid_any = validf[:, :1]                       # [C, 1]

        cnt5 = counts.reshape(C, W, P, A, S)
        maxc = cnt5.max(axis=3)                         # [C, W, P, S]
        oh_t = (a_t[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (C, A, S), 1)).astype(jnp.float32)
        at = (cnt5 * oh_t[:, None, None]).sum(axis=3)   # [C, W, P, S]
        covf = (a_t >= 0).astype(jnp.float32)
        wcov = (w_t * covf)[:, None, None, :]
        emptyf = (maxc == 0.0).astype(jnp.float32)
        nonempty = 1.0 - emptyf
        same = (wcov * nonempty
                * (at == maxc).astype(jnp.float32)).sum(-1)
        diff = ((wcov * nonempty
                 * (at < maxc).astype(jnp.float32)).sum(-1)
                + eps_w[:, :, None]
                * (covf[:, None, None, :] * emptyf).sum(-1))  # [C, W, P]
        pval = binom_tail_jnp(same + diff, diff, eps_w[:, :, None], div)
        lse = log_sum_exp_jnp(pval, axis=-1)
        keepf = ((pval - lse[:, :, None]) > cutoff).astype(jnp.float32)
        okf = keepf * live.astype(jnp.float32)[:, :, None]
        cand = jnp.where(okf > 0.0, score[:, :, None] + diff, jnp.inf)
        flat = cand.reshape(C, W * P)

        def pick(k, carry):
            flat_c, parents, parts, sels = carry
            idx = jnp.argmin(flat_c, axis=1)
            m = jnp.min(flat_c, axis=1)
            kcol = rank_w == k
            parents = jnp.where(
                kcol, (idx // P)[:, None].astype(jnp.int32), parents)
            parts = jnp.where(
                kcol, (idx % P)[:, None].astype(jnp.int32), parts)
            sels = jnp.where(kcol, m[:, None], sels)
            flat_c = jnp.where(lane_wp == idx[:, None], jnp.inf, flat_c)
            return flat_c, parents, parts, sels

        parents0 = jnp.zeros((C, W), jnp.int32)
        parts0 = jnp.zeros((C, W), jnp.int32)
        sels0 = jnp.full((C, W), jnp.inf, jnp.float32)
        _f, parents, parts, sels = jax.lax.fori_loop(
            0, W, pick, (flat, parents0, parts0, sels0))
        new_score = jnp.where(jnp.isfinite(sels), sels, jnp.inf)

        # Beam gather as per-instance one-hot matmuls on the MXU.
        flatc = counts.reshape(C, W, P * A * S)
        newc_rows = []
        for c in range(C):
            g_oh = (parents[c][:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (W, W), 1)).astype(jnp.float32)
            newc_rows.append(jax.lax.dot_general(
                g_oh, flatc[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        newc = jnp.stack(newc_rows).reshape(C, W, P, A * S)
        part_oh = (parts[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (C, W, P), 2)).astype(jnp.float32)
        update = ((w_t * covf)[:, None, :] * oh_t).reshape(C, 1, A * S)
        newc = newc + part_oh[..., None] * update[:, :, None, :]

        vf3 = valid_any[:, :, None]
        counts_ref[...] = (vf3 * newc.reshape(C, W * P * A, S)
                           + (1.0 - vf3) * counts_ref[...])
        sc = jnp.where(valid_any > 0.0, new_score, score)
        score_ref[...] = sc
        validb = validf > 0.0
        mpar_ref[t, :, :] = jnp.where(validb, parents, rank_w)
        mpart_ref[t, :, :] = jnp.where(validb, parts, -1)
        return 0

    jax.lax.fori_loop(0, T2, step, 0)
    score_out_ref[...] = score_ref[...]
