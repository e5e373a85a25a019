"""Batched SNP-local realignment.

The reference re-calls each (read, SNP) pair by globally aligning a 32bp
read window against the reference window with each candidate allele
substituted at the center, keeping the allele with the best score
(alignment.rs:7-64, SIMD block-aligner: match +1 / mismatch -1, gap open
-2 extend -1). That is thousands of independent fixed-size
needleman-wunsch problems — ideal device shape — so we collect every
(read, SNP) job for a contig with vectorized window gathers and run
chunked batched affine-gap NW (Gotoh) over all (job, allele) pairs.

Deviation from the reference (documented design choice): exact NW
instead of block-aligner's banded block approximation (the band covers
the full 32x32 problem at block size 8 in most cases, so scores rarely
differ).

Supplementary-alignment quirk, replicated exactly for parity: the
reference offsets a supplementary record's stored query positions by
its leading hard-clips even though seq_string holds the hard-clipped
sequence (file_reader.rs:719-720), so realignment windows for such
sites are either misplaced by the clip length or dropped by the bounds
guard (alignment.rs:24-27). Both ingest paths here reproduce that
offset (ingest/fragments.py:66-85, native/bgzf_bam.cpp lead_hard);
pinned by tests/test_ingest.py::test_supp_hardclip_offset_parity.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..frag import Frag
from ..ingest.vcf import ContigVcf

FLANK = 16
WINDOW = 2 * FLANK
GAP_OPEN = -2.0
GAP_EXTEND = -1.0
MATCH = 1.0
MISMATCH = -1.0
NEG = -1e9

# Jobs per on-device map step; the whole sweep is ONE dispatch with a
# lax.map over chunks (chunk count bucketed to powers of two), because
# per-dispatch latency on remote devices dwarfs the compute.
CHUNK_JOBS = 32768


@jax.jit
def _nw_scores_chunked(q3: jax.Array, r3: jax.Array,
                       al3: jax.Array) -> jax.Array:
    """One dispatch for the whole sweep: chunks [n, C, W] of read/ref
    windows plus allele bytes [n, C, A]; allele variants are constructed
    ON DEVICE (uploading pre-substituted windows would 4x the transfer).
    Returns [n, C, A] scores."""
    def one_chunk(args):
        q, r, al = args                       # [C, W], [C, W], [C, A]
        C, W = q.shape
        A = al.shape[1]
        var = jnp.repeat(r[:, None, :], A, axis=1)
        var = var.at[:, :, FLANK].set(al)
        qq = jnp.repeat(q[:, None, :], A, axis=1)
        return _nw_scores(qq.reshape(C * A, W),
                          var.reshape(C * A, W)).reshape(C, A)

    return jax.lax.map(one_chunk, (q3, r3, al3))


@jax.jit
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
        ix = jnp.maximum(m_prev + GAP_OPEN, ix_prev + GAP_EXTEND)
        ix = ix.at[:, 0].set(GAP_OPEN + GAP_EXTEND * i.astype(
            jnp.float32))
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


_OFFSETS = np.arange(-FLANK, FLANK)


class RealignPool:
    """Contig-agnostic job pool: windows + per-job allele candidates.
    Shared across contigs so a whole contig group realigns in one
    device dispatch."""

    def __init__(self):
        self._q: List[np.ndarray] = []
        self._r: List[np.ndarray] = []
        self._al: List[np.ndarray] = []
        self._nal: List[np.ndarray] = []
        self._targets: List = []  # (frag, snp_pos array per batch)


class SnpRealigner:
    """Collects (read, SNP) realignment jobs with vectorized window
    gathers and applies them in chunked batched device calls. Pass a
    shared RealignPool to batch several contigs into one flush."""

    def __init__(self, ref_seq: bytes, contig_vcf: ContigVcf,
                 pool: "RealignPool" = None):
        self.ref = np.frombuffer(ref_seq.upper(), dtype=np.uint8)
        self.cv = contig_vcf
        self.allele_mat = contig_vcf.allele_matrix()       # [n_snp, A]
        self.n_alleles = (self.allele_mat > 0).sum(axis=1)
        self.pool = pool if pool is not None else RealignPool()

    def realign(self, frag: Frag) -> None:
        """Queue one fragment (pure-Python ingest path: sites still live
        in dicts)."""
        if not frag.seq_dict:
            return
        snps = np.fromiter(frag.seq_dict.keys(), dtype=np.int64,
                           count=len(frag.seq_dict))
        qpos = np.fromiter(
            (frag.snp_pos_to_seq_pos[int(p)][1] for p in snps),
            dtype=np.int64, count=len(snps))
        self.add_jobs(frag, snps, qpos,
                      np.frombuffer(frag.seq_string[0].upper(),
                                    dtype=np.uint8))

    def add_jobs(self, frag: Frag, snp_counters: np.ndarray,
                 qpos: np.ndarray, seq: np.ndarray) -> None:
        """Queue sites given as arrays (1-based SNP counters)."""
        snp_idx = snp_counters.astype(np.int64) - 1
        gn = self.cv.genome_pos[snp_idx]
        ok = ((gn >= FLANK) & (gn + FLANK < len(self.ref))
              & (qpos >= FLANK) & (qpos + FLANK < len(seq)))
        if not ok.any():
            return
        gn = gn[ok]
        qp = qpos[ok]
        pool = self.pool
        pool._q.append(seq[qp[:, None] + _OFFSETS])
        pool._r.append(self.ref[gn[:, None] + _OFFSETS])
        pool._al.append(self.allele_mat[snp_idx[ok]])
        pool._nal.append(self.n_alleles[snp_idx[ok]])
        pool._targets.append((frag, snp_counters[ok]))

    def flush(self) -> None:
        """Flush this realigner's pool (a shared pool flushes every
        contig's jobs at once)."""
        flush_pool(self.pool)


def flush_pool(pool: RealignPool) -> None:
    if not pool._targets:
        return
    q = np.concatenate(pool._q)
    r = np.concatenate(pool._r)
    al = np.concatenate(pool._al)
    nal = np.concatenate(pool._nal)
    N = len(q)
    A = al.shape[1]
    n_chunks = (N + CHUNK_JOBS - 1) // CHUNK_JOBS
    # Bucket the chunk count (multiples of 8, power-of-two for small)
    # so few shapes compile while bounding padding waste.
    if n_chunks <= 8:
        n_pad = 1 << max(0, (n_chunks - 1)).bit_length()
    else:
        n_pad = ((n_chunks + 7) // 8) * 8
    n_pad = max(n_pad, 1)
    total = n_pad * CHUNK_JOBS
    q_all = np.zeros((total, WINDOW), np.uint8)
    r_all = np.zeros((total, WINDOW), np.uint8)
    al_all = np.zeros((total, A), np.uint8)
    q_all[:N] = q
    r_all[:N] = r
    al_all[:N] = al
    scores = np.array(_nw_scores_chunked(
        jnp.asarray(q_all.reshape(n_pad, CHUNK_JOBS, WINDOW)),
        jnp.asarray(r_all.reshape(n_pad, CHUNK_JOBS, WINDOW)),
        jnp.asarray(al_all.reshape(n_pad, CHUNK_JOBS, A)))
    ).reshape(total, A)[:N]
    scores[np.arange(A)[None, :] >= nal[:, None]] = -np.inf
    best = scores.argmax(axis=1).astype(np.int8)

    off = 0
    for frag, snp_pos in pool._targets:
        calls = best[off:off + len(snp_pos)]
        off += len(snp_pos)
        frag.seq_dict.update(
            zip((int(p) for p in snp_pos),
                (int(b) for b in calls)))
    pool._q.clear()
    pool._r.clear()
    pool._al.clear()
    pool._nal.clear()
    pool._targets.clear()
