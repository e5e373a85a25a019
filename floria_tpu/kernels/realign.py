"""Batched SNP-local realignment.

The reference re-calls each (read, SNP) pair by globally aligning a 32bp
read window against the reference window with each candidate allele
substituted at the center, keeping the allele with the best score
(alignment.rs:7-64, SIMD block-aligner: match +1 / mismatch -1, gap open
-2 extend -1). That is thousands of independent fixed-size
needleman-wunsch problems — ideal device shape — so we collect every
(read, SNP) job for a contig and run one batched affine-gap NW (Gotoh)
over all (job, allele) pairs.

Deviations from the reference, both documented design choices:
- exact NW instead of block-aligner's banded block approximation (the
  band covers the full 32x32 problem at block size 8 in most cases, so
  scores rarely differ);
- supplementary-alignment windows use the record's own query coordinates;
  the reference offsets them by leading hard-clips into a hard-clipped
  sequence (file_reader.rs:719-720), which misplaces the window.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..frag import Frag
from ..ingest.vcf import ContigVcf

FLANK = 16
WINDOW = 2 * FLANK
GAP_OPEN = -2.0
GAP_EXTEND = -1.0
MATCH = 1.0
MISMATCH = -1.0
NEG = -1e9


@functools.partial(jax.jit, static_argnames=())
def _nw_scores(q: jax.Array, r: jax.Array) -> jax.Array:
    """Global affine-gap alignment scores for a batch of equal-length
    sequence pairs. q, r: [N, W] uint8. Returns [N] float32."""
    N, W = q.shape
    jcols = jnp.arange(W + 1, dtype=jnp.float32)

    # Boundary row i=0: only gaps along the reference.
    m0 = jnp.where(jnp.arange(W + 1) == 0, 0.0, NEG)
    iy0 = jnp.where(jnp.arange(W + 1) == 0, NEG,
                    GAP_OPEN + GAP_EXTEND * (jcols - 1.0))
    ix0 = jnp.full(W + 1, NEG)
    m0 = jnp.broadcast_to(m0, (N, W + 1))
    iy0 = jnp.broadcast_to(iy0, (N, W + 1))
    ix0 = jnp.broadcast_to(ix0, (N, W + 1))

    def row_step(carry, qi_and_i):
        m_prev, ix_prev, iy_prev = carry
        q_i, i = qi_and_i
        h_prev = jnp.maximum(jnp.maximum(m_prev, ix_prev), iy_prev)
        sub = jnp.where(q_i[:, None] == r, MATCH, MISMATCH)  # [N, W]
        m = jnp.concatenate(
            [jnp.full((N, 1), NEG), h_prev[:, :-1] + sub], axis=1)
        m = m.at[:, 0].set(NEG)
        ix = jnp.maximum(m_prev + GAP_OPEN, ix_prev + GAP_EXTEND)
        ix = ix.at[:, 0].set(GAP_OPEN + GAP_EXTEND * (i.astype(
            jnp.float32)))
        # Iy via max-plus prefix: Iy[j] = e*j + cummax_{k<j}(M[k]+o-e(k+1))
        base = m + GAP_OPEN - GAP_EXTEND * (jcols + 1.0)
        base = jnp.maximum(base, ix + GAP_OPEN - GAP_EXTEND * (jcols
                                                               + 1.0))
        cm = jax.lax.cummax(base, axis=1)
        iy = jnp.concatenate(
            [jnp.full((N, 1), NEG),
             cm[:, :-1] + GAP_EXTEND * jcols[None, 1:]], axis=1)
        return (m, ix, iy), None

    qi = q.astype(jnp.int32).T  # [W, N]
    ii = jnp.arange(W, dtype=jnp.int32)
    (m, ix, iy), _ = jax.lax.scan(row_step, (m0, ix0, iy0), (qi, ii))
    return jnp.maximum(jnp.maximum(m[:, -1], ix[:, -1]), iy[:, -1])


class SnpRealigner:
    """Collects (read, SNP) realignment jobs and applies them in one
    batched device call per contig."""

    def __init__(self, ref_seq: bytes, contig_vcf: ContigVcf):
        self.ref = np.frombuffer(ref_seq.upper(), dtype=np.uint8)
        self.cv = contig_vcf
        self._jobs_q: List[np.ndarray] = []
        self._jobs_r: List[np.ndarray] = []
        self._jobs_alleles: List[bytes] = []
        self._targets: List[tuple] = []  # (frag, snp_pos)

    def realign(self, frag: Frag) -> None:
        if not frag.seq_dict:
            return
        seq = np.frombuffer(frag.seq_string[0].upper(), dtype=np.uint8)
        for snp_pos in frag.seq_dict:
            gn = self.cv.snp_to_gn(snp_pos)
            qpos = frag.snp_pos_to_seq_pos[snp_pos][1]
            if (FLANK > gn or FLANK + gn >= len(self.ref)
                    or FLANK > qpos or FLANK + qpos >= len(seq)):
                continue
            self._jobs_q.append(seq[qpos - FLANK:qpos + FLANK])
            self._jobs_r.append(self.ref[gn - FLANK:gn + FLANK].copy())
            self._jobs_alleles.append(self.cv.pos_allele_map[gn])
            self._targets.append((frag, snp_pos))

    def flush(self) -> None:
        if not self._targets:
            return
        N = len(self._targets)
        A = constants.MAX_ALLELES
        q = np.stack(self._jobs_q)
        r = np.stack(self._jobs_r)
        # Variant windows: allele substituted at the center.
        variants = np.repeat(r[:, None, :], A, axis=1)  # [N, A, W]
        n_alleles = np.zeros(N, dtype=np.int64)
        for i, al in enumerate(self._jobs_alleles):
            n_alleles[i] = len(al)
            for a, b in enumerate(al):
                variants[i, a, FLANK] = b
        q_all = np.repeat(q[:, None, :], A, axis=1).reshape(N * A, WINDOW)
        scores = np.array(
            _nw_scores(jnp.asarray(q_all),
                       jnp.asarray(variants.reshape(N * A, WINDOW)))
        ).reshape(N, A)
        scores[np.arange(A)[None, :] >= n_alleles[:, None]] = -np.inf
        # First strictly-best allele (the reference keeps the first max,
        # alignment.rs:50-56).
        best = scores.argmax(axis=1)
        for (frag, snp_pos), b in zip(self._targets, best):
            frag.seq_dict[snp_pos] = int(b)
        self._jobs_q.clear()
        self._jobs_r.clear()
        self._jobs_alleles.clear()
        self._targets.clear()
