"""Block-length / epsilon auto-estimation from BAM pileup sampling.

file_reader.rs:749-826: walk pileup columns, process every 1000th one (up
to 1000 columns): column error = non-majority / majority base fraction;
epsilon = max(66th percentile column error, 0.01); block length = max(66th
percentile of read lengths observed at sampled columns, 500).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .. import constants
from . import bam as bamlib


def l_epsilon_auto_detect(bam_path: str) -> Tuple[int, float]:
    bf = bamlib.BamFile(bam_path)
    err_vec = []
    read_lengths = []
    stop = 1000
    done = False
    for tid in sorted(bf.records_by_contig()):
        if tid < 0 or done:
            continue
        records = [r for r in bf.records_by_contig()[tid]
                   if not (r.flag & (bamlib.ERRORS_MASK
                                     | bamlib.FLAG_SECONDARY))
                   and len(r.seq)]
        if not records:
            continue
        # Pileup columns = positions covered by >= 1 read; sample every
        # 1000th.
        events = []
        for r in records:
            events.append((r.pos, 1))
            events.append((r.reference_end(), -1))
        events.sort()
        covered = []
        depth = 0
        prev = None
        for pos, d in events:
            if prev is not None and depth > 0 and pos > prev:
                covered.append((prev, pos))
            depth += d
            prev = pos
        columns = np.concatenate([np.arange(a, b) for a, b in covered]) \
            if covered else np.empty(0, dtype=np.int64)
        sampled = columns[::1000]
        starts = np.array([r.pos for r in records])
        for col in sampled:
            # reads whose alignment covers col
            base_counts = {}
            lo = np.searchsorted(starts, col, side="right")
            for r in records[:lo]:
                if r.reference_end() <= col:
                    continue
                qpos, rpos = bamlib.aligned_snp_pairs(
                    r, np.array([col], dtype=np.int64))
                if len(qpos) == 0:
                    continue  # deletion at col
                read_lengths.append(len(r.seq))
                base = int(r.seq[qpos[0]])
                base_counts[base] = base_counts.get(base, 0.0) + 1.0
            if not base_counts:
                continue
            total = sum(base_counts.values())
            most = max(base_counts.values())
            if total < 5.0:
                continue
            err_vec.append((total - most) / most)
            if len(err_vec) >= stop and read_lengths:
                done = True
                break
    if not read_lengths:
        return constants.MINIMUM_BLOCK_SIZE, 0.01
    read_lengths.sort()
    q_66 = read_lengths[len(read_lengths) * 66 // 100]
    err_vec.sort()
    med66 = err_vec[len(err_vec) * 66 // 100] if err_vec else 0.0
    final_eps = max(med66, 0.01)
    final_l = max(q_66, constants.MINIMUM_BLOCK_SIZE)
    return final_l, final_eps
