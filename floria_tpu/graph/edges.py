"""Hap-graph edge construction: unambiguous shared-read counting.

For each node of block i, each of its reads votes for the node of block
i+1 that contains it — but only when the read's rounded distance to its
nearest block-(i+1) haplotype is strictly better than to the second
nearest (ambiguous reads abstain; crucial for short reads). Edges with at
least MIN_SHARED_READS_UNAMBIG votes are kept
(graph_processing.rs:22-100). This join is the only cross-block
synchronization in the whole pipeline.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .. import constants
from ..frag import Frag
from .hapnode import HapNode


def _read_node_diff(frag: Frag, node: HapNode) -> int:
    """Rounded phred diff of a read vs a node's restricted consensus
    (utils_frags.rs:77-108 semantics; ties add nothing)."""
    lo, hi = node.snp_endpoints
    sel = (frag.snps >= lo) & (frag.snps <= hi)
    if not sel.any():
        return 0
    cols = frag.snps[sel] - lo
    alleles = frag.alleles[sel].astype(np.int64)
    weights = frag.weights[sel]
    has_key = node.exist[cols].sum(axis=-1) > 0
    at = node.counts[cols, alleles]
    at_exists = node.exist[cols, alleles] > 0
    maxc = node.counts[cols].max(axis=-1)
    # diff: covered-by-map sites where the read's allele neither is a
    # maximal existing entry nor exists at all at max weight
    diff_mask = has_key & ~(at_exists & (at == maxc))
    return int(round(float(weights[diff_mask].sum())))


def update_hap_graph(hap_graph: List[List[HapNode]],
                     frags: Sequence[Frag]) -> None:
    """Attach out/in edges between adjacent blocks in place."""
    for i in range(len(hap_graph) - 1):
        block1 = hap_graph[i]
        block2 = hap_graph[i + 1]
        membership = {}
        for l, node2 in enumerate(block2):
            for fid in node2.frag_ids:
                membership[int(fid)] = l
        # Cache read-vs-node2 diffs: reads shared across block1 nodes.
        diff_cache = {}
        for node1 in block1:
            out_weights = np.zeros(len(block2))
            for fid in node1.frag_ids:
                fid = int(fid)
                if fid not in diff_cache:
                    frag = frags[fid]
                    diff_cache[fid] = [
                        _read_node_diff(frag, node2) for node2 in block2]
                diffs = diff_cache[fid]
                hap_id_in = membership.get(fid)
                if len(diffs) > 1:
                    top2 = sorted(diffs)[:2]
                    if top2[0] != top2[1]:
                        if hap_id_in is not None:
                            out_weights[hap_id_in] += 1.0
                else:
                    if hap_id_in is not None:
                        out_weights[hap_id_in] += 1.0
            for l in range(len(block2)):
                if out_weights[l] >= constants.MIN_SHARED_READS_UNAMBIG:
                    node1.out_edges.append((l, float(out_weights[l])))
        # Mirror in_edges on the receiving side
        for j, node1 in enumerate(block1):
            for (l, w) in node1.out_edges:
                block2[l].in_edges.append((j, w))
