"""Distance and MEC statistics over dense count tensors (host numpy).

These are the tensor formulations of the reference's hashmap walks:

- read<->haplotype distance with epsilon penalty for uncovered sites and
  tie forgiveness (utils_frags.rs:32-75): a site contributes `same` iff the
  read's allele count equals the part's max count there; an all-zero site
  contributes epsilon to `diff`.
- the unweighted-rounded distance used for graph edges
  (utils_frags.rs:77-108), where allele-entry existence matters.
- per-part MEC statistics with a single-coverage epsilon penalty
  (local_clustering.rs:157-260).

Device (jnp) twins of the inner reductions live in beam.py / upem.py where
they fuse into the scan kernels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def distance_read_hap_eps(alleles_row: np.ndarray, weights_row: np.ndarray,
                          counts: np.ndarray,
                          epsilon: float) -> Tuple[float, float]:
    """(same, diff) of one read vs one part's counts[S, A]."""
    covered = alleles_row >= 0
    maxc = counts.max(axis=-1)
    at = np.take_along_axis(
        counts, np.maximum(alleles_row, 0)[:, None], axis=-1)[:, 0]
    empty = maxc == 0
    same_mask = covered & ~empty & (at == maxc)
    diff_mask = covered & ~empty & (at < maxc)
    same = float(weights_row[same_mask].sum())
    diff = float(weights_row[diff_mask].sum() + epsilon * (covered
                                                           & empty).sum())
    return same, diff


def distance_matrix_eps(alleles: np.ndarray, weights: np.ndarray,
                        counts: np.ndarray,
                        epsilon: float) -> Tuple[np.ndarray, np.ndarray]:
    """(same, diff)[R, P] for all reads vs all parts.

    alleles [R, S], weights [R, S], counts [P, S, A].
    """
    covered = alleles >= 0                                   # [R, S]
    maxc = counts.max(axis=-1)                               # [P, S]
    idx = np.maximum(alleles, 0)
    at = counts[:, np.arange(alleles.shape[1])[None, :], idx]  # [P, R, S]
    at = np.swapaxes(at, 0, 1)                               # [R, P, S]
    empty = (maxc == 0)[None, :, :]                          # [1, P, S]
    cov = covered[:, None, :]
    w = weights[:, None, :]
    same_mask = cov & ~empty & (at == maxc[None])
    diff_mask = cov & ~empty & (at < maxc[None])
    # f64 accumulation: weights are 2^-26-grid multiples (and epsilon is
    # grid-quantized, options.py), so these sums are EXACT and equal to
    # the reference's sequential f64 walk in any order. An f32 sum here
    # measurably diverged at deep coverage (round-4 deep fuzz).
    w64 = w.astype(np.float64)
    same = (w64 * same_mask).sum(-1)
    diff = (w64 * diff_mask).sum(-1) + epsilon * (cov & empty).sum(-1)
    return same, diff


def distance_read_hap_plain(alleles_row: np.ndarray,
                            weights_row: np.ndarray, counts: np.ndarray,
                            exist: np.ndarray) -> Tuple[int, int]:
    """Rounded (same, diff) vs a haplotype with entry-existence mask.

    counts [S, A] weighted counts; exist [S, A] > 0 where a hashmap entry
    would exist. Sites without any entry are skipped entirely; a read allele
    whose count ties the max counts as neither (utils_frags.rs:93-104).
    """
    covered = alleles_row >= 0
    has_key = exist.sum(axis=-1) > 0
    m = covered & has_key
    if not m.any():
        return 0, 0
    idx = np.maximum(alleles_row, 0)
    sl = np.arange(len(alleles_row))
    at = counts[sl, idx]
    at_exists = exist[sl, idx] > 0
    maxc = counts.max(axis=-1)
    # consensus = argmax over existing entries (smallest index on ties)
    consensus = np.where(exist > 0, counts, -np.inf).argmax(axis=-1)
    same_mask = m & (idx == consensus)
    # ties against a different allele add nothing; absent entries or lower
    # counts add to diff
    tie_mask = m & ~same_mask & at_exists & (at == maxc)
    diff_mask = m & ~same_mask & ~tie_mask
    same = float(weights_row[same_mask].sum())
    diff = float(weights_row[diff_mask].sum())
    return int(round(same)), int(round(diff))


def mec_stats_epsilon(counts: np.ndarray, cover: np.ndarray,
                      epsilon: float) -> np.ndarray:
    """[P, 2] (bases, errors) per part from counts/cover [P, S, A].

    Per covered site: bases += max count, errors += total - max, plus
    epsilon when the max is <= 1 (single coverage)
    (local_clustering.rs:218-260).
    """
    has_key = cover.sum(axis=-1) > 0                # [P, S]
    maxc = counts.max(axis=-1)
    total = counts.sum(axis=-1)
    bases = (maxc * has_key).sum(axis=-1)
    errors = ((total - maxc) * has_key).sum(axis=-1)
    errors = errors + epsilon * (has_key & (maxc <= 1.0)).sum(axis=-1)
    return np.stack([bases, errors], axis=-1)


def consensus_allele(counts: np.ndarray, cover: np.ndarray) -> np.ndarray:
    """[S] canonical consensus: argmax count among existing entries, ties
    broken by smallest allele index; -1 where no entry exists.

    The reference's pick among exact ties follows hashmap iteration order
    (utils_frags.rs:53-59); we fix the smallest-index rule for determinism.
    """
    has_key = cover.sum(axis=-1) > 0
    masked = np.where(cover > 0, counts, -np.inf)
    cons = masked.argmax(axis=-1)
    return np.where(has_key, cons, -1)
