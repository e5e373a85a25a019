"""Haplotype graph nodes.

A HapNode is one part of one block's chosen partition: its read set, its
consensus allele-count map restricted to the block's SNP interval, and a
2/3-quantile coverage (types_structs.rs:155-214). Nodes of adjacent blocks
are linked by unambiguous shared-read counts (graph_processing.rs:22-100).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .. import constants
from ..frag import Frag


@dataclasses.dataclass
class HapNode:
    column: int                      # block index in graph order
    row: int                         # part index within the block
    node_id: int                     # global id (assigned in column order)
    frag_ids: np.ndarray             # sorted counter ids of member reads
    snp_endpoints: Tuple[int, int]   # 1-based inclusive SNP interval
    # Restricted consensus state over [lo, hi]: weighted counts and
    # entry-existence counts, both [S_node, A].
    counts: np.ndarray
    exist: np.ndarray
    cov: float
    out_edges: List[Tuple[int, float]] = dataclasses.field(
        default_factory=list)  # (row in next column, weight)
    in_edges: List[Tuple[int, float]] = dataclasses.field(
        default_factory=list)
    out_flows: List[Tuple[int, float]] = dataclasses.field(
        default_factory=list)

    @property
    def frag_id_set(self) -> set:
        return set(int(i) for i in self.frag_ids)


def build_hap_node(frags: Sequence[Frag], frag_ids: np.ndarray,
                   snp_endpoints: Tuple[int, int], column: int,
                   row: int) -> HapNode:
    """HapNode::new (types_structs.rs:168-209): phred-weighted allele
    counts restricted to the SNP interval; coverage = the 2/3-quantile of
    the flattened per-(site, allele) count list."""
    lo, hi = snp_endpoints
    S = hi - lo + 1
    A = constants.MAX_ALLELES
    counts = np.zeros((S, A), dtype=np.float64)
    exist = np.zeros((S, A), dtype=np.int32)
    for fid in frag_ids:
        f = frags[int(fid)]
        sel = (f.snps >= lo) & (f.snps <= hi)
        cols = f.snps[sel] - lo
        np.add.at(counts, (cols, f.alleles[sel]), f.weights[sel])
        np.add.at(exist, (cols, f.alleles[sel]), 1)
    vals = counts[exist > 0]
    if vals.size == 0:
        cov = 0.0
    else:
        vals = np.sort(vals)
        cov = float(vals[len(vals) * 2 // 3])
    return HapNode(column=column, row=row, node_id=-1,
                   frag_ids=np.sort(np.asarray(frag_ids, dtype=np.int64)),
                   snp_endpoints=snp_endpoints, counts=counts, exist=exist,
                   cov=cov)


def assign_ids(hap_graph: List[List[HapNode]]) -> None:
    """Column-major global ids (graph_processing.rs:306-323)."""
    counter = 0
    for column, block in enumerate(hap_graph):
        for node in block:
            node.column = column
            node.node_id = counter
            counter += 1
