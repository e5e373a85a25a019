"""Batched beam-search phasing kernel (the framework's hot loop).

Reimplements the reference's per-block beam search
(global_clustering.rs:10-208) as a dense JAX program:

- a beam slot's state is the part-wise allele count tensor [P, A, S]
  (the HapBlock) plus its cumulative MEC score; the SNP axis S is the
  minor (lane) dimension so tiles map onto the VPU without padding waste;
- one lax.scan step inserts one read: distances of the read against every
  (beam, part) pair are masked reductions over S; the binomial tail +
  log-sum-exp posterior prunes branches; rank-by-counting selection
  (_rank_select) replaces the BinaryHeap — bit-equal to lax.top_k order
  but ~10x cheaper than its sort lowering on TPU;
- the scan runs in two phases matching the reference's beam widening
  (global_clustering.rs:50-55): the first 25 reads keep ploidy*W beam
  slots, a transition step selects the top W, and the remaining reads
  scan only W slots — a ~P-fold saving on the long tail;
- the whole thing vmaps over a batch of block instances, which is where
  the TPU win comes from — the reference parallelizes over blocks with
  rayon (graph_processing.rs:345-362), we batch them onto the VPU.

Truncation note: the reference prunes haplotype positions left of the
current read start when copying blocks (types_structs.rs:327-376). Since
reads are inserted sorted by start and every read's own positions are at
or after the previous read's start, truncation can never change any later
distance computation, so the kernel keeps full (untruncated) counts.
Duplicate-block dedup (global_clustering.rs:122-127), which IS sensitive
to truncation (chains that differ only in the assignment of fully
truncated reads produce equal blocks), is realized exactly in tensor
form (dedup=True, the default): per-candidate linear fingerprints of the
truncated window plus a closed-form reduction of the reference's
sequential keep-the-worse scan — see _step. Broken-block bookkeeping
affects only disabled reference code paths (WEIRD_SPLIT=false).

Tie-breaks: the beam slot order maintained by top_k is (score asc,
candidate generation order asc), which is exactly the host oracle's
(score, uid) canonical order (tests/oracle.py), inductively: top_k ties
resolve to the lowest flattened (parent slot, part) index and parents
are already in canonical order.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..frag import phred_weight
from .scores import binom_tail_jnp, log_sum_exp_jnp

# phred qual -> weight, computed host-side with the exact expression
# frag.freeze uses, so device-reconstructed weights are bitwise equal to
# host weights. Index 0 maps to 0.0, matching zeroed padding.
_PHRED_TABLE = phred_weight(np.arange(256, dtype=np.uint8))


@jax.jit
def quals_to_weights(quals: jax.Array) -> jax.Array:
    """Device-side weight reconstruction from uint8 quals (uploads
    shrink 5 bytes/cell -> 2; the remote-TPU link made transfer the
    dominant dispatch cost)."""
    return jnp.take(jnp.asarray(_PHRED_TABLE), quals.astype(jnp.int32))

# Plain python float: a module-level jnp scalar would initialize the
# XLA backend at import time, breaking jax.distributed.initialize for
# any process that imports this module first (multihost workers).
INF = float("inf")

# Loop-overhead amortization for the per-read scans; read insertion is
# inherently sequential, unrolling only trades code size for dispatch
# overhead.
_SCAN_UNROLL = 4

# Finite stand-in for INF during candidate ranking (cumulative MEC
# scores are bounded by the total phred weight, orders of magnitude
# below this).
_BIG = jnp.float32(1e30)
_BIG_CUT = jnp.float32(1e29)


def _rank_select(cand, out_slots):
    """Select the best out_slots candidates of cand [B, P] in exactly
    lax.top_k's (score asc, flattened index asc) order, via rank-by-
    counting: a pairwise comparison matrix + one-hot picks. N here is a
    few hundred, so the O(N^2) compare is a handful of microseconds of
    VPU work — while lax.top_k's sort lowering dominated the whole beam
    step (~126 of ~137 us/step measured on v5e; scripts/profile_step.py).

    Returns (sel_score [out], gather_oh [out, B], part_oh [out, P],
    parent [out] int32, part [out] int32). sel_score reproduces the
    picked candidate bitwise (one-hot sums add exact +0s); INF
    candidates come back as _BIG."""
    B, P = cand.shape
    N = B * P
    flat = jnp.minimum(cand.reshape(N), _BIG)
    gen = jnp.arange(N)
    less = ((flat[None, :] < flat[:, None])
            | ((flat[None, :] == flat[:, None])
               & (gen[None, :] < gen[:, None])))
    rank = less.sum(axis=1)                      # [N], a permutation
    sel = (rank[None, :] == jnp.arange(out_slots)[:, None]).astype(
        jnp.float32)                             # [out, N] one-hot rows
    sel_score = (sel * flat[None, :]).sum(-1)
    sel3 = sel.reshape(out_slots, B, P)
    gather_oh = sel3.sum(-1)                     # [out, B]
    part_oh = sel3.sum(-2)                       # [out, P]
    parent = (gather_oh @ jnp.arange(B, dtype=jnp.float32)).astype(
        jnp.int32)
    part = (part_oh @ jnp.arange(P, dtype=jnp.float32)).astype(jnp.int32)
    return sel_score, gather_oh, part_oh, parent, part


class BeamResult(NamedTuple):
    """Per-phase traceback records + final beam state.

    warm_parents/parts cover reads [0, T1) over B1 = ploidy*W slots;
    main_parents/parts cover reads [T1, R) over W slots (the first main
    step's parents index into the B1 warm slots). scores/live describe
    the final beam (width W when a main phase exists, else B1).
    """
    warm_parents: jax.Array   # [G, T1, B1]
    warm_parts: jax.Array     # [G, T1, B1]
    main_parents: jax.Array   # [G, R - T1, W]
    main_parts: jax.Array     # [G, R - T1, W]
    scores: jax.Array         # [G, B_final]
    live: jax.Array           # [G, B_final]


@functools.partial(jax.jit, static_argnames=("ploidy", "beam_width",
                                             "max_alleles", "window",
                                             "dedup"))
def beam_search_batch(alleles: jax.Array, weights: jax.Array,
                      num_reads: jax.Array, epsilon: jax.Array,
                      ploidy: int, beam_width: int,
                      max_alleles: int = constants.MAX_ALLELES,
                      window: int = 0, dedup: bool = True) -> BeamResult:
    """Phase a batch of block instances at a fixed ploidy.

    alleles  [G, R, S] int8 (-1 = uncovered / padding)
    weights  [G, R, S] float32
    num_reads [G] int32 — live reads per instance (rest are padding rows)
    epsilon  [G] float32 — per-contig error rate
    window   sliding compute-window width in sites (0 or >= S => full).
             Must be >= any read's column span + 128; per-step compute
             then touches only the window, exploiting the fact that
             columns behind the sorted-read frontier are never read
             again (the tensor analog of the reference's haplotype
             truncation, types_structs.rs:327-376).
    """
    G = alleles.shape[0]
    num_parts = jnp.full(G, ploidy, dtype=jnp.int32)
    return beam_search_batch_mixed(alleles, weights, num_reads, epsilon,
                                   num_parts, ploidy, beam_width,
                                   max_alleles, window, dedup)


@functools.partial(jax.jit, static_argnames=("max_ploidy", "beam_width",
                                             "max_alleles", "window",
                                             "dedup", "impl"))
def beam_search_batch_mixed(alleles: jax.Array, weights: jax.Array,
                            num_reads: jax.Array, epsilon: jax.Array,
                            num_parts: jax.Array, max_ploidy: int,
                            beam_width: int,
                            max_alleles: int = constants.MAX_ALLELES,
                            window: int = 0, dedup: bool = True,
                            impl: str = "hist") -> BeamResult:
    """Mixed-ploidy batch: each instance phases into its own number of
    parts (num_parts[g] <= max_ploidy); inactive parts are masked out of
    scoring, pruning, and candidate selection, so one dispatch covers a
    whole ploidy sweep. Beam slots are max_ploidy * beam_width wide with
    per-instance warmup widths of num_parts * beam_width
    (global_clustering.rs:50-55).

    impl: "hist" (default) carries the assignment-history state and
    reconstructs window counts by matmul (fastest on TPU — the counts
    permutation was bandwidth-bound); "counts" carries the materialized
    count tensor. Both produce identical results."""
    S = alleles.shape[-1]
    if window <= 0 or window >= S:
        window = S
    single = (_beam_search_single_hist if impl == "hist"
              else _beam_search_single)
    fn = jax.vmap(functools.partial(
        single, ploidy=max_ploidy, beam_width=beam_width,
        max_alleles=max_alleles, window=window, dedup=dedup))
    return BeamResult(*fn(alleles, weights, num_reads, epsilon,
                          num_parts.astype(jnp.int32)))


def _step(counts, score, live, t, off_t, a_cov, w_t, oh_t, num_reads,
          eps, width, ploidy, out_slots, window, part_active=None,
          start_t=None, hash_consts=None):
    """Insert read t into every live beam; keep the best `width` of the
    top `out_slots` candidates. counts: [B, P, A, S]; compute touches
    only the `window` columns starting at off_t (see beam_search_batch).
    Columns ahead of every window are all-zero in every slot, columns
    behind the frontier are never read again, so skipping them in the
    beam permutation preserves all downstream results exactly.

    When hash_consts is given, duplicate candidate blocks are deduped
    exactly like the reference (global_clustering.rs:122-127): two
    candidates are duplicates when their count tensors truncated at the
    read start (start_t) coincide; among duplicates only a candidate
    strictly better than every earlier (generation-order) one survives —
    closed form of the reference's sequential keep-the-worse scan, since
    kept scores form a strictly decreasing-MEC chain. Equality is
    detected by three independent linear fingerprints (identical
    truncated blocks are bitwise identical here: both chains added the
    same reads to the same parts in the same scan order, so each cell
    and hence each fingerprint reduction is reproduced bit-for-bit;
    distinct blocks collide with probability ~2^-69 per pair — see
    _hash_consts)."""
    B, P, A, S = counts.shape
    cutoff = jnp.float32(math.log(constants.PROB_CUTOFF))
    div = jnp.float32(constants.DIV_FACTOR)
    valid = t < num_reads

    if window < S:
        win = jax.lax.dynamic_slice(counts, (0, 0, 0, off_t),
                                    (B, P, A, window))
        a_cov_w = jax.lax.dynamic_slice(a_cov, (off_t,), (window,))
        w_w = jax.lax.dynamic_slice(w_t, (off_t,), (window,))
        oh_w = jax.lax.dynamic_slice(oh_t, (0, off_t), (A, window))
    else:
        win, a_cov_w, w_w, oh_w = counts, a_cov, w_t, oh_t

    maxc = win.max(axis=2)                                  # [B, P, Wn]
    at = (win * oh_w[None, None]).sum(axis=2)               # [B, P, Wn]
    empty = maxc == 0.0
    cov = a_cov_w[None, None, :]
    w = w_w[None, None, :]
    same = (w * (cov & ~empty & (at == maxc))).sum(-1)      # [B, P]
    diff = ((w * (cov & ~empty & (at < maxc))).sum(-1)
            + eps * (cov & empty).sum(-1))
    pval = binom_tail_jnp(same + diff, diff, eps, div)      # [B, P]
    if part_active is not None:
        # Inactive parts drop out of the posterior and the candidates.
        pval = jnp.where(part_active[None, :], pval, -jnp.inf)
    lse = log_sum_exp_jnp(pval, axis=-1)                    # [B]
    keep = (pval - lse[:, None]) > cutoff
    if part_active is not None:
        keep = keep & part_active[None, :]
    cand = jnp.where(keep & live[:, None],
                     score[:, None] + diff, INF)            # [B, P]

    if hash_consts is not None:
        vs, gs = hash_consts                 # [A, S] x3, [P] x3
        start_loc = start_t - off_t if window < S else start_t
        colmask = (jnp.arange(window) >= start_loc).astype(jnp.float32)
        h_list = []
        for v, gp in zip(vs, gs):
            vw = (jax.lax.dynamic_slice(v, (0, off_t), (A, window))
                  if window < S else v)
            # Truncated-parent fingerprint + the read's delta per part.
            ph = jnp.einsum("bpas,as->bp", win, vw * colmask[None],
                            preferred_element_type=jnp.float32) @ gp
            rc = (oh_w * w_w[None] * vw).sum()
            h_list.append((ph[:, None] + gp[None, :] * rc).reshape(B * P))
        flat = cand.reshape(B * P)
        gen = jnp.arange(B * P)
        finite = jnp.isfinite(flat)
        eq = functools.reduce(
            jnp.logical_and,
            [(h[:, None] == h[None, :]) for h in h_list])
        dup = (eq & (gen[None, :] < gen[:, None]) & finite[None, :]
               & (flat[None, :] >= flat[:, None]))
        cand = jnp.where(dup.any(axis=1).reshape(B, P), INF, cand)

    sel_score, gather_oh, part_oh, parent, part = _rank_select(
        cand, out_slots)
    new_live = (jnp.arange(out_slots) < width) & (sel_score < _BIG_CUT)

    # Beam gather as a one-hot MXU matmul — substantially faster than an
    # indexed gather on TPU for these shapes.
    neww = jnp.einsum("bB,BPAS->bPAS", gather_oh, win,
                      preferred_element_type=jnp.float32)
    update = w_w[None, :] * oh_w                            # [A, Wn]
    neww = neww + part_oh[:, :, None, None] * update[None, None]
    new_score = jnp.where(new_live, sel_score, INF)

    base = counts if out_slots == B else counts[:out_slots]
    if window < S:
        neww = jnp.where(valid, neww,
                         jax.lax.dynamic_slice(
                             base, (0, 0, 0, off_t),
                             (out_slots, P, A, window)))
        counts_out = jax.lax.dynamic_update_slice(base, neww,
                                                  (0, 0, 0, off_t))
    else:
        counts_out = jnp.where(valid, neww, base)
    score_out = jnp.where(valid, new_score,
                          score if out_slots == B else score[:out_slots])
    live_out = jnp.where(valid, new_live,
                         live if out_slots == B else live[:out_slots])
    out_parent = jnp.where(valid, parent,
                           jnp.arange(out_slots)).astype(jnp.int32)
    out_part = jnp.where(valid, part, -1).astype(jnp.int32)
    return counts_out, score_out, live_out, out_parent, out_part


def _read_starts(covered_all, S):
    """First covered column per read (S for all-padding rows)."""
    col = jnp.argmax(covered_all, axis=1).astype(jnp.int32)
    has = covered_all.any(axis=1)
    return jnp.where(has, col, S).astype(jnp.int32)


def _window_offsets(covered_all, S, window):
    """Per-read 128-aligned window start columns: floor-128 of the first
    covered column, clipped so the window stays inside [0, S), made
    monotone (reads are sorted by start, so this is already monotone up
    to padding rows, where cummax holds the last offset)."""
    if window >= S:
        return jnp.zeros(covered_all.shape[0], dtype=jnp.int32)
    start = jnp.minimum(_read_starts(covered_all, S), S - 1)
    off = (start // 128) * 128
    off = jnp.minimum(off, S - window)
    off = jax.lax.cummax(off)
    return off


_NUM_FINGERPRINTS = 3


def _hash_consts(max_alleles, S, ploidy):
    """Deterministic positive fingerprint vectors for block dedup
    (positive so masked-out columns contribute consistently-signed
    zeros; see _step's dedup note). Three independent fingerprints:
    true duplicates match all three bitwise (each reduction is
    reproduced term-for-term); distinct blocks must collide in three
    independent float32 projections at once — ~2^-69 per candidate
    pair, i.e. beyond any practical workload's pair count (a run of
    10^12 candidate pairs has < 10^-8 odds of a single false dedup)."""
    rng = np.random.default_rng(0xF10E1A)
    vs = [jnp.asarray(rng.uniform(0.5, 2.0, (max_alleles, S)),
                      dtype=jnp.float32)
          for _ in range(_NUM_FINGERPRINTS)]
    gs = [jnp.asarray(rng.uniform(0.5, 2.0, ploidy), dtype=jnp.float32)
          for _ in range(_NUM_FINGERPRINTS)]
    return vs, gs


def _step_hist(hist, score, live, t, off_t, start_t, a_cov, w_t, oh_t,
               wa, zs, num_reads, eps, width, ploidy, out_slots,
               window, gs, part_active=None, dedup=True):
    """hist-state twin of _step: the beam state is the per-slot
    assignment history hist[B, P, R] (one-hot over reads) instead of the
    materialized count tensor. The window's counts are reconstructed
    each step by one MXU matmul over the read axis — O(B*P*R*A*window)
    FLOPs instead of O(B*P*A*S) state bytes permuted, which profiling
    showed is the beam step's bottleneck on TPU (the permutation of an
    ~80 MB counts state dominated; hist is ~8 MB).

    Truncated-block fingerprints for dedup come from per-read suffix
    sums z[r, s] = sum_{s'>=s} w*v(allele) — a read fully left of the
    truncation frontier contributes exactly +0.0 to every part's
    fingerprint, so duplicate chains (differing only in such reads'
    parts) hash bitwise-identically, term for term."""
    B, P, R = hist.shape
    A, S = oh_t.shape
    cutoff = jnp.float32(math.log(constants.PROB_CUTOFF))
    div = jnp.float32(constants.DIV_FACTOR)
    valid = t < num_reads

    if window < S:
        wa_win = jax.lax.dynamic_slice(wa, (0, 0, off_t),
                                       (R, A, window))
        a_cov_w = jax.lax.dynamic_slice(a_cov, (off_t,), (window,))
        w_w = jax.lax.dynamic_slice(w_t, (off_t,), (window,))
        oh_w = jax.lax.dynamic_slice(oh_t, (0, off_t), (A, window))
    else:
        wa_win, a_cov_w, w_w, oh_w = wa, a_cov, w_t, oh_t

    win = jnp.einsum("bpr,raw->bpaw", hist, wa_win,
                     preferred_element_type=jnp.float32)
    maxc = win.max(axis=2)                                  # [B, P, Wn]
    at = (win * oh_w[None, None]).sum(axis=2)               # [B, P, Wn]
    empty = maxc == 0.0
    cov = a_cov_w[None, None, :]
    w = w_w[None, None, :]
    same = (w * (cov & ~empty & (at == maxc))).sum(-1)      # [B, P]
    diff = ((w * (cov & ~empty & (at < maxc))).sum(-1)
            + eps * (cov & empty).sum(-1))
    pval = binom_tail_jnp(same + diff, diff, eps, div)      # [B, P]
    if part_active is not None:
        pval = jnp.where(part_active[None, :], pval, -jnp.inf)
    lse = log_sum_exp_jnp(pval, axis=-1)                    # [B]
    keep = (pval - lse[:, None]) > cutoff
    if part_active is not None:
        keep = keep & part_active[None, :]
    cand = jnp.where(keep & live[:, None],
                     score[:, None] + diff, INF)            # [B, P]

    if dedup:
        h_list = []
        for z, gp in zip(zs, gs):
            zt = jax.lax.dynamic_slice(z, (0, start_t), (R, 1))[:, 0]
            ph = jnp.einsum("bpr,r->bp", hist, zt,
                            preferred_element_type=jnp.float32)
            rc = zt[t]  # the read's own full contribution
            h_list.append(((ph @ gp)[:, None]
                           + gp[None, :] * rc).reshape(B * P))
        flat = cand.reshape(B * P)
        gen = jnp.arange(B * P)
        finite = jnp.isfinite(flat)
        eq = functools.reduce(
            jnp.logical_and,
            [(h[:, None] == h[None, :]) for h in h_list])
        dup = (eq & (gen[None, :] < gen[:, None]) & finite[None, :]
               & (flat[None, :] >= flat[:, None]))
        cand = jnp.where(dup.any(axis=1).reshape(B, P), INF, cand)

    sel_score, gather_oh, part_oh, parent, part = _rank_select(
        cand, out_slots)
    new_live = (jnp.arange(out_slots) < width) & (sel_score < _BIG_CUT)

    newhist = jnp.einsum("bB,BPR->bPR", gather_oh, hist,
                         preferred_element_type=jnp.float32)
    t_oh = (jnp.arange(R) == t).astype(jnp.float32)         # [R]
    newhist = newhist + part_oh[:, :, None] * t_oh[None, None, :]
    new_score = jnp.where(new_live, sel_score, INF)

    base = hist if out_slots == B else hist[:out_slots]
    hist_out = jnp.where(valid, newhist, base)
    score_out = jnp.where(valid, new_score,
                          score if out_slots == B else score[:out_slots])
    live_out = jnp.where(valid, new_live,
                         live if out_slots == B else live[:out_slots])
    out_parent = jnp.where(valid, parent,
                           jnp.arange(out_slots)).astype(jnp.int32)
    out_part = jnp.where(valid, part, -1).astype(jnp.int32)
    return hist_out, score_out, live_out, out_parent, out_part


def _suffix_hash(weights, oh_all, v):
    """z[r, s] = sum_{s' >= s} w[r, s'] * v[allele_{r,s'}, s'], padded
    with a zero column at s = S (fully truncated reads hash to +0)."""
    contrib = (oh_all * v[None]).sum(axis=1) * weights      # [R, S]
    z = jnp.cumsum(contrib[:, ::-1], axis=1)[:, ::-1]
    return jnp.concatenate(
        [z, jnp.zeros((z.shape[0], 1), dtype=z.dtype)], axis=1)


def _beam_search_single_hist(alleles, weights, num_reads, epsilon,
                             num_parts=None, *, ploidy, beam_width,
                             max_alleles, window=0, dedup=True):
    R, S = alleles.shape
    P = ploidy
    A = max_alleles
    B1 = ploidy * beam_width
    W = beam_width
    rec_dt = jnp.int8 if B1 <= 127 else jnp.int16
    if window <= 0 or window > S:
        window = S
    eps = epsilon.astype(jnp.float32)
    if num_parts is None:
        part_active = None
        warm_width = B1
    else:
        part_active = jnp.arange(P) < num_parts
        warm_width = num_parts * W

    covered_all = alleles >= 0
    oh_all = (alleles[:, None, :] == jnp.arange(A, dtype=alleles.dtype)[
        None, :, None]).astype(jnp.float32)
    offs = _window_offsets(covered_all, S, window)
    starts = _read_starts(covered_all, S)
    vs, gs = _hash_consts(A, S, P)
    wa = oh_all * weights[:, None, :]                       # [R, A, S]
    zs = [_suffix_hash(weights, oh_all, v) for v in vs]

    hist = jnp.zeros((B1, P, R), dtype=jnp.float32)
    score = jnp.where(jnp.arange(B1) == 0, 0.0, jnp.inf).astype(
        jnp.float32)
    live = jnp.arange(B1) == 0

    T1 = min(constants.BEAM_WARMUP_READS, R)

    def make_step(width, out_slots):
        def step_fn(state, xs):
            hist, score, live = state
            t, off_t, st_t, a_cov, w_t, oh_t = xs
            hist, score, live, parent, part = _step_hist(
                hist, score, live, t, off_t, st_t, a_cov, w_t, oh_t,
                wa, zs, num_reads, eps, width=width, ploidy=P,
                out_slots=out_slots, window=window, gs=gs,
                part_active=part_active, dedup=dedup)
            # int8 traceback records: parent < B1 <= 127, part < P —
            # quarters the result download vs int32.
            return ((hist, score, live),
                    (parent.astype(rec_dt), part.astype(rec_dt)))
        return step_fn

    ts = jnp.arange(R, dtype=jnp.int32)
    (hist, score, live), (warm_parents, warm_parts) = jax.lax.scan(
        make_step(warm_width, B1), (hist, score, live),
        (ts[:T1], offs[:T1], starts[:T1], covered_all[:T1],
         weights[:T1], oh_all[:T1]), unroll=_SCAN_UNROLL)

    if R <= T1:
        empty = jnp.zeros((0, W), dtype=rec_dt)
        return (warm_parents, warm_parts, empty, empty, score, live)

    hist, score, live, tr_parent, tr_part = _step_hist(
        hist, score, live, jnp.int32(T1), offs[T1], starts[T1],
        covered_all[T1], weights[T1], oh_all[T1], wa, zs,
        num_reads, eps, width=W, ploidy=P, out_slots=W, window=window,
        gs=gs, part_active=part_active, dedup=dedup)
    tr_parent = tr_parent.astype(rec_dt)
    tr_part = tr_part.astype(rec_dt)

    (hist, score, live), (m_parents, m_parts) = jax.lax.scan(
        make_step(W, W), (hist, score, live),
        (ts[T1 + 1:], offs[T1 + 1:], starts[T1 + 1:],
         covered_all[T1 + 1:], weights[T1 + 1:], oh_all[T1 + 1:]),
        unroll=_SCAN_UNROLL)

    main_parents = jnp.concatenate([tr_parent[None], m_parents], axis=0)
    main_parts = jnp.concatenate([tr_part[None], m_parts], axis=0)
    return (warm_parents, warm_parts, main_parents, main_parts, score,
            live)


def _beam_search_single(alleles, weights, num_reads, epsilon,
                        num_parts=None, *, ploidy, beam_width,
                        max_alleles, window=0, dedup=True):
    R, S = alleles.shape
    P = ploidy
    A = max_alleles
    B1 = ploidy * beam_width
    W = beam_width
    rec_dt = jnp.int8 if B1 <= 127 else jnp.int16
    if window <= 0 or window > S:
        window = S
    eps = epsilon.astype(jnp.float32)
    if num_parts is None:
        part_active = None
        warm_width = B1
    else:
        part_active = jnp.arange(P) < num_parts
        warm_width = num_parts * W

    covered_all = alleles >= 0
    # One-hot over alleles with S minor: oh[r, a, s]
    oh_all = (alleles[:, None, :] == jnp.arange(A, dtype=alleles.dtype)[
        None, :, None]).astype(jnp.float32)
    offs = _window_offsets(covered_all, S, window)
    starts = _read_starts(covered_all, S)
    hc = _hash_consts(A, S, P) if dedup else None

    counts = jnp.zeros((B1, P, A, S), dtype=jnp.float32)
    score = jnp.where(jnp.arange(B1) == 0, 0.0, jnp.inf).astype(
        jnp.float32)
    live = jnp.arange(B1) == 0

    T1 = min(constants.BEAM_WARMUP_READS, R)

    def warm_step(state, xs):
        counts, score, live = state
        t, off_t, st_t, a_cov, w_t, oh_t = xs
        counts, score, live, parent, part = _step(
            counts, score, live, t, off_t, a_cov, w_t, oh_t, num_reads,
            eps, width=warm_width, ploidy=P, out_slots=B1,
            window=window, part_active=part_active, start_t=st_t,
            hash_consts=hc)
        return ((counts, score, live),
                (parent.astype(rec_dt), part.astype(rec_dt)))

    ts = jnp.arange(R, dtype=jnp.int32)
    (counts, score, live), (warm_parents, warm_parts) = jax.lax.scan(
        warm_step, (counts, score, live),
        (ts[:T1], offs[:T1], starts[:T1], covered_all[:T1],
         weights[:T1], oh_all[:T1]), unroll=_SCAN_UNROLL)

    if R <= T1:
        empty = jnp.zeros((0, W), dtype=rec_dt)
        return (warm_parents, warm_parts, empty, empty, score, live)

    # Transition step (read index T1): full B1 parent space, width W.
    counts, score, live, tr_parent, tr_part = _step(
        counts, score, live, jnp.int32(T1), offs[T1], covered_all[T1],
        weights[T1], oh_all[T1], num_reads, eps, width=W, ploidy=P,
        out_slots=W, window=window, part_active=part_active,
        start_t=starts[T1], hash_consts=hc)
    tr_parent = tr_parent.astype(rec_dt)
    tr_part = tr_part.astype(rec_dt)

    def main_step(state, xs):
        counts, score, live = state
        t, off_t, st_t, a_cov, w_t, oh_t = xs
        counts, score, live, parent, part = _step(
            counts, score, live, t, off_t, a_cov, w_t, oh_t, num_reads,
            eps, width=W, ploidy=P, out_slots=W, window=window,
            part_active=part_active, start_t=st_t, hash_consts=hc)
        return ((counts, score, live),
                (parent.astype(rec_dt), part.astype(rec_dt)))

    (counts, score, live), (m_parents, m_parts) = jax.lax.scan(
        main_step, (counts, score, live),
        (ts[T1 + 1:], offs[T1 + 1:], starts[T1 + 1:],
         covered_all[T1 + 1:], weights[T1 + 1:], oh_all[T1 + 1:]),
        unroll=_SCAN_UNROLL)

    main_parents = jnp.concatenate([tr_parent[None], m_parents], axis=0)
    main_parts = jnp.concatenate([tr_part[None], m_parts], axis=0)
    return (warm_parents, warm_parts, main_parents, main_parts, score,
            live)


@jax.jit
def traceback_batch(result) -> jax.Array:
    """On-device twin of traceback() for a whole batch: walk each
    instance's best-slot parent chain with two reversed scans and return
    [G, R] assignments (int8). Padding steps recorded identity parents,
    so rows past num_reads are sliced off by the caller. Downloading
    this single small array replaces pulling all six BeamResult arrays
    per shape group — per-array round trips over the remote-TPU link
    dominated the beam stage's wall time."""
    def one(warm_parents, warm_parts, main_parents, main_parts, scores,
            live):
        best = jnp.argmin(jnp.where(live, scores, INF)).astype(jnp.int32)

        def back(b, rec):
            parents, parts = rec
            return parents[b].astype(jnp.int32), parts[b]

        b, m_assign = jax.lax.scan(back, best,
                                   (main_parents, main_parts),
                                   reverse=True)
        _b, w_assign = jax.lax.scan(back, b, (warm_parents, warm_parts),
                                    reverse=True)
        return jnp.concatenate([w_assign, m_assign])

    return jax.vmap(one)(*result)


def traceback(result_g, num_reads: int, ploidy: int) -> np.ndarray:
    """Recover the best beam's read -> part assignment for one instance.

    result_g: per-instance tuple (warm_parents [T1, B1], warm_parts,
    main_parents [T2, W], main_parts, scores, live). Mirrors the
    reference's parent-chain walk (global_clustering.rs:149-178).
    """
    warm_parents, warm_parts, main_parents, main_parts, scores, live = (
        np.asarray(a) for a in result_g)
    scores = np.where(live, scores, np.inf)
    b = int(np.argmin(scores))
    assignment = np.zeros(num_reads, dtype=np.int32)
    T1 = warm_parents.shape[0]
    T2 = main_parents.shape[0]
    # Walk the main phase (reads T1+T2-1 .. T1), then the warm phase.
    # Padding steps recorded identity parents, so the chain passes
    # through them untouched.
    for t in range(T2 - 1, -1, -1):
        read_idx = T1 + t
        if read_idx < num_reads:
            assignment[read_idx] = main_parts[t, b]
        b = int(main_parents[t, b])
    for t in range(T1 - 1, -1, -1):
        if t < num_reads:
            assignment[t] = warm_parts[t, b]
        b = int(warm_parents[t, b])
    return assignment
