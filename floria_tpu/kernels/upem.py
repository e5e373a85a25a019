"""UPEM hill-climb refinement of a block partition.

Reimplements optimize_clustering / opt_iterate
(local_clustering.rs:71-130, 292-358): up to NUM_ITER_OPTIMIZE rounds; each
round scores every (read, source part, target part) move by the drop in the
read's epsilon-distance, sorts beneficial moves by gain, and applies
roughly the top tenth (at least a third + 1 when few), never moving a read
twice nor emptying a part. The round is kept only while the phred MEC-
epsilon objective strictly improves.

The move *evaluation* (a reads x parts distance matrix) is the vectorized
part; the move *application* is inherently sequential (part sizes update as
moves land) and runs on host, exactly as the reference does it.

This per-block implementation is the validated sequential baseline; the
production pipeline uses the batched lockstep variant in upem_batch.py,
which tests pin to this one.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .. import constants
from .blocktensor import BlockTensor, partition_counts, partition_cover
from .stats import distance_matrix_eps, mec_stats_epsilon


def mec_epsilon_score(block: BlockTensor, assignment: np.ndarray,
                      ploidy: int, epsilon: float) -> float:
    """-(sum of per-part MEC-epsilon errors), phred-weighted
    (local_clustering.rs:97-99)."""
    counts = partition_counts(block, assignment, ploidy, weighted=True)
    cover = partition_cover(block, assignment, ploidy)
    stats = mec_stats_epsilon(counts, cover, epsilon)
    return -float(stats[:, 1].sum())


def opt_iterate(block: BlockTensor, assignment: np.ndarray, ploidy: int,
                epsilon: float) -> np.ndarray:
    """One move round (local_clustering.rs:292-358). Returns the new
    assignment (a copy; input is not modified)."""
    R = block.num_reads
    counts = partition_counts(block, assignment, ploidy, weighted=True)
    _same, diff = distance_matrix_eps(block.alleles[:R], block.weights[:R],
                                      counts, epsilon)      # [R, P]
    part_sizes = np.bincount(assignment[assignment >= 0], minlength=ploidy)

    moves = []  # (gain, read, src, dst)
    for r in range(R):
        i = assignment[r]
        if i < 0 or part_sizes[i] <= 1:
            continue
        own = diff[r, i]
        for j in range(ploidy):
            if j == i:
                continue
            gain = own - diff[r, j]
            if gain > 0.0:
                moves.append((gain, r, i, j))
    new_assignment = assignment.copy()
    if not moves:
        return new_assignment
    # Sort by gain descending; ties keep generation order (read-major,
    # target-part order), which is deterministic.
    moves.sort(key=lambda m: -m[0])
    number_of_moves = len(moves) // 10
    if number_of_moves == 0:
        number_of_moves = len(moves) // 3 + 1

    moved = set()
    sizes = part_sizes.copy()
    for mv_num, (gain, r, i, j) in enumerate(moves):
        if r in moved:
            continue
        if sizes[i] == 1:
            continue
        new_assignment[r] = j
        sizes[j] += 1
        sizes[i] -= 1
        moved.add(r)
        if mv_num > number_of_moves:
            break
    return new_assignment


def optimize_clustering(block: BlockTensor, assignment: np.ndarray,
                        ploidy: int, epsilon: float,
                        max_iters: int = constants.NUM_ITER_OPTIMIZE
                        ) -> Tuple[float, np.ndarray]:
    """(best score, best assignment) — local_clustering.rs:71-130."""
    if not (assignment >= 0).any():
        return 0.0, assignment
    prev_score = mec_epsilon_score(block, assignment, ploidy, epsilon)
    best = assignment
    for _ in range(max_iters):
        new = opt_iterate(block, best, ploidy, epsilon)
        new_score = mec_epsilon_score(block, new, ploidy, epsilon)
        if new_score > prev_score:
            prev_score = new_score
            best = new
        else:
            return prev_score, best
    return prev_score, best
