"""Batched beam-search phasing kernel (the framework's hot loop).

Reimplements the reference's per-block beam search
(global_clustering.rs:10-208) as a dense JAX program:

- a beam slot's state is the part-wise allele count tensor [P, S, A]
  (the HapBlock) plus its cumulative MEC score;
- one lax.scan step inserts one read: distances of the read against every
  (beam, part) pair are masked reductions; the binomial tail + log-sum-exp
  posterior prunes branches; a single lax.top_k replaces the BinaryHeap;
- the whole thing vmaps over a batch of block instances, which is where the
  TPU win comes from — the reference parallelizes over blocks with rayon
  (graph_processing.rs:345-362), we batch them onto the VPU.

Truncation note: the reference prunes haplotype positions left of the
current read start when copying blocks (types_structs.rs:327-376). Since
reads are inserted sorted by start and every read's own positions are at or
after the previous read's start, truncation can never change any later
distance computation, so the kernel keeps full (untruncated) counts.
Consequences that do depend on truncation — duplicate-block dedup
(global_clustering.rs:122-127) and broken-block bookkeeping — affect only
disabled reference code paths (WEIRD_SPLIT=false) or rare exact-duplicate
beams; the host oracle in tests/ carries the exact semantics.

Final-beam tie-break: lowest score wins, ties by lowest slot index (the
reference's BinaryHeap order on ties is unspecified).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from .scores import binom_tail_jnp, log_sum_exp_jnp

INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("ploidy", "beam_width",
                                             "max_alleles"))
def beam_search_batch(alleles: jax.Array, weights: jax.Array,
                      num_reads: jax.Array, epsilon: jax.Array,
                      ploidy: int, beam_width: int,
                      max_alleles: int = constants.MAX_ALLELES) -> Tuple[
                          jax.Array, jax.Array, jax.Array, jax.Array]:
    """Phase a batch of block instances at a fixed ploidy.

    alleles  [G, R, S] int8 (-1 = uncovered / padding)
    weights  [G, R, S] float32
    num_reads [G] int32 — live reads per instance (rest are padding rows)
    epsilon  [G] float32 — per-contig error rate

    Returns (parents [G, R, B], parts [G, R, B], scores [G, B],
    live [G, B]) with B = ploidy * beam_width beam slots.
    """
    fn = jax.vmap(functools.partial(
        _beam_search_single, ploidy=ploidy, beam_width=beam_width,
        max_alleles=max_alleles))
    return fn(alleles, weights, num_reads, epsilon)


def _beam_search_single(alleles, weights, num_reads, epsilon, *, ploidy,
                        beam_width, max_alleles):
    R, S = alleles.shape
    P = ploidy
    A = max_alleles
    B = ploidy * beam_width
    cutoff = jnp.float32(math.log(constants.PROB_CUTOFF))
    div = jnp.float32(constants.DIV_FACTOR)
    eps = epsilon.astype(jnp.float32)

    counts0 = jnp.zeros((B, P, S, A), dtype=jnp.float32)
    score0 = jnp.where(jnp.arange(B) == 0, 0.0, jnp.inf).astype(jnp.float32)
    live0 = jnp.arange(B) == 0

    onehot_sites = jax.nn.one_hot(
        jnp.clip(alleles, 0, A - 1), A, dtype=jnp.float32)  # [R, S, A]
    covered_all = (alleles >= 0)

    def step(state, xs):
        counts, score, live = state
        t, a_cov, w_t, oh_t = xs
        valid = t < num_reads

        maxc = counts.max(axis=-1)                          # [B, P, S]
        at = jnp.einsum("bpsa,sa->bps", counts, oh_t)       # [B, P, S]
        empty = maxc == 0.0
        cov = a_cov[None, None, :]
        w = w_t[None, None, :]
        same = (w * cov * ~empty * (at == maxc)).sum(-1)    # [B, P]
        diff = ((w * cov * ~empty * (at < maxc)).sum(-1)
                + eps * (cov & empty).sum(-1))
        pval = binom_tail_jnp(same + diff, diff, eps, div)  # [B, P]
        lse = log_sum_exp_jnp(pval, axis=-1)                # [B]
        keep = (pval - lse[:, None]) > cutoff
        cand = jnp.where(keep & live[:, None],
                         score[:, None] + diff, INF)        # [B, P]

        width = jnp.where(t < constants.BEAM_WARMUP_READS, B, beam_width)
        neg, idx = jax.lax.top_k(-cand.reshape(B * P), B)
        sel_score = -neg
        rank_ok = jnp.arange(B) < width
        new_live = rank_ok & jnp.isfinite(sel_score)
        parent = idx // P
        part = idx % P

        newc = counts[parent]                               # [B, P, S, A]
        part_oh = jax.nn.one_hot(part, P, dtype=jnp.float32)  # [B, P]
        update = w_t[:, None] * oh_t                        # [S, A]
        newc = newc + part_oh[:, :, None, None] * update[None, None]
        new_score = jnp.where(new_live, sel_score, INF)

        counts = jnp.where(valid, newc, counts)
        score = jnp.where(valid, new_score, score)
        live = jnp.where(valid, new_live, live)
        out_parent = jnp.where(valid, parent, 0).astype(jnp.int32)
        out_part = jnp.where(valid, part, 0).astype(jnp.int32)
        return (counts, score, live), (out_parent, out_part)

    ts = jnp.arange(R, dtype=jnp.int32)
    (counts, score, live), (parents, parts) = jax.lax.scan(
        step, (counts0, score0, live0),
        (ts, covered_all, weights, onehot_sites))
    return parents, parts, score, live


def traceback(parents: np.ndarray, parts: np.ndarray, scores: np.ndarray,
              live: np.ndarray, num_reads: int,
              ploidy: int) -> np.ndarray:
    """Recover the best beam's read -> part assignment.

    parents/parts [R, B]; returns assignment [num_reads] int32. Mirrors the
    reference's parent-chain walk (global_clustering.rs:149-178).
    """
    scores = np.where(live, scores, np.inf)
    best = int(np.argmin(scores))
    assignment = np.zeros(num_reads, dtype=np.int32)
    b = best
    for t in range(num_reads - 1, -1, -1):
        assignment[t] = parts[t, b]
        b = int(parents[t, b])
    return assignment
