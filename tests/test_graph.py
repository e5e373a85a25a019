"""Unit tests for the hap-graph stage: edge counting, LP flow, widest
paths, finalization, HAPQ."""

import numpy as np
import pytest

from floria_tpu.frag import Frag
from floria_tpu.graph.edges import update_hap_graph
from floria_tpu.graph.flow import solve_lp_graph
from floria_tpu.graph.hapnode import assign_ids, build_hap_node
from floria_tpu.graph.paths import Haplogroup, get_disjoint_paths
from floria_tpu.options import Options
from floria_tpu.post.finalize import (process_reads_for_final_parts,
                                      separate_broken_haplogroups)
from floria_tpu.post.hapq import get_hapq


def _frag(counter, sites, qual=30):
    f = Frag(f"r{counter}", counter, False)
    for i, (snp, allele) in enumerate(sites.items()):
        f.add_site(snp, allele, qual, 0, i)
    f.freeze()
    return f


def _two_strain_world():
    """Two strains over SNPs 1..12, reads spanning two blocks (1-6, 5-12).
    Strain A = allele 0 everywhere, strain B = allele 1 everywhere."""
    frags = []
    cid = 0
    for k in range(2):
        for start in (1, 3, 5, 7):
            sites = {p: k for p in range(start, min(start + 6, 13))}
            frags.append(_frag(cid, sites))
            cid += 1
    frags.sort(key=Frag.sort_key)
    for i, f in enumerate(frags):
        f.counter_id = i
    return frags


def test_hapgraph_edges_and_flow():
    frags = _two_strain_world()
    # Blocks: SNPs 1-6 and 5-12; per block two parts by strain.
    def ids_for(block_range, strain):
        out = []
        for f in frags:
            overlap = not (f.last_position < block_range[0]
                           or f.first_position > block_range[1])
            if overlap and f.alleles[0] == strain:
                out.append(f.counter_id)
        return np.array(out)

    graph = []
    for col, rng in enumerate([(1, 6), (5, 12)]):
        nodes = [build_hap_node(frags, ids_for(rng, k), rng, col, k)
                 for k in range(2)]
        graph.append(nodes)
    assign_ids(graph)
    update_hap_graph(graph, frags)

    # Same-strain nodes across blocks must be linked; cross-strain not.
    e0 = dict(graph[0][0].out_edges)
    e1 = dict(graph[0][1].out_edges)
    assert 0 in e0 and 1 not in e0
    assert 1 in e1 and 0 not in e1

    flows = solve_lp_graph(graph)
    assert len(flows) == 2
    for (_a, _b, flow) in flows:
        assert flow > 0

    groups = get_disjoint_paths(graph, flows)
    assert len(groups) == 2
    for g in groups:
        assert g.snp_range == (1, 12)
        strains = {int(frags[i].alleles[0]) for i in g.frag_ids}
        assert len(strains) == 1  # strain-pure path


def test_widest_path_dropoff_cut():
    # Chain A(flow 100) -> B with a weak side branch C (flow 5 < 0.33*100):
    #   col0: a ; col1: b ; col2: main d, side c
    frags = _two_strain_world()
    ids = np.array([0])
    g = [[build_hap_node(frags, ids, (1, 2), 0, 0)],
         [build_hap_node(frags, ids, (3, 4), 1, 0)],
         [build_hap_node(frags, ids, (5, 6), 2, 0),
          build_hap_node(frags, np.array([1]), (5, 6), 2, 1)]]
    assign_ids(g)
    flows = [((0, 0), (1, 0), 100.0), ((1, 0), (2, 0), 90.0),
             ((1, 0), (2, 1), 5.0)]
    groups = get_disjoint_paths(g, flows)
    # Main path a-b-d plus the cut-off side node as its own group.
    assert len(groups) == 2
    sizes = sorted(len(gr.frag_ids) for gr in groups)
    assert sizes == [1, 1]  # frag 0 in main path, frag 1 isolated


def test_process_reads_final_parts_dedup():
    frags = _two_strain_world()
    # Overlapping haplogroups sharing one read.
    shared = frags[0].counter_id
    h1 = Haplogroup(frag_ids=np.array([shared, frags[1].counter_id]),
                    snp_range=(1, 6), cov=3.0)
    h2 = Haplogroup(frag_ids=np.array([shared, frags[2].counter_id]),
                    snp_range=(5, 12), cov=3.0)
    parts, ranges = process_reads_for_final_parts(
        [h1, h2], frags, [], Options(epsilon=0.02))
    all_ids = [fid for p in parts for fid in p]
    assert all_ids.count(shared) == 1  # appears exactly once


def test_separate_broken_haplogroups():
    # A haplogroup whose reads leave a zero-coverage gap at SNP 6-7.
    f1 = _frag(0, {p: 0 for p in range(1, 6)})
    f2 = _frag(1, {p: 0 for p in range(8, 12)})
    frags = [f1, f2]
    parts = [{0, 1}]
    ranges = [(1, 11)]
    separate_broken_haplogroups(parts, ranges, frags)
    # Original emptied; two new segments appended.
    assert parts[0] == set()
    assert len(parts) == 3
    assert ranges[1] == (1, 5) and ranges[2] == (6, 11)
    # The read that closes a segment is dropped — reference behavior
    # (part_block_manip.rs:68-84 inserts nothing on the else branch).
    assert parts[1] == {0} and parts[2] == set()


def test_reassign_short_after_broken_split():
    """--reassign-short scores against the ORIGINAL parts only: the
    reference iterates all_parts_block.blocks
    (part_block_manip.rs:240-241), which broken-group separation never
    extends — so a short read can resurrect a cleared original part,
    and the appended split parts must not be scored (previously an
    IndexError into the original-length consensus state)."""
    f1 = _frag(0, {p: 0 for p in range(1, 6)})
    f2 = _frag(1, {p: 0 for p in range(8, 12)})
    frags = [f1, f2]
    short = Frag("s0", 2, True)
    short.add_site(3, 0, 30, 0, 0)
    short.freeze()
    h = Haplogroup(frag_ids=np.array([0, 1]), snp_range=(1, 11), cov=2.0)
    parts, ranges = process_reads_for_final_parts(
        [h], frags + [short], [short],
        Options(epsilon=0.02, reassign_short=True))
    by_range = dict(zip(ranges, parts))
    # The split appended (1,5)/(6,11); the short frag re-attached to the
    # cleared ORIGINAL (1,11) part, resurrecting it.
    assert by_range[(1, 11)] == {2}
    assert by_range[(1, 5)] == {0}
    assert by_range[(6, 11)] == set()


def test_hapq_scoring():
    frags = _two_strain_world()
    parts = [set(f.counter_id for f in frags
                 if f.alleles[0] == k) for k in range(2)]
    ranges = [(1, 12), (1, 12)]
    gp = np.arange(100, 100 + 12 * 500, 500)
    hapqs, rel_err, avg_err = get_hapq(parts, ranges, frags, gp,
                                       block_length=1000)
    assert len(hapqs) == 2
    for q in hapqs:
        assert 0 <= q <= 60
    # Two fully-overlapping but DIFFERENT strains: dist=1 -> no penalty.
    # 8 reads each -> t2 = 1; range 5500/1000 -> t3 = ln(6.5) ~ 1.87
    assert hapqs[0] == min(60, int(40 * 1.0 * np.log(5500 / 1000 + 1)))
    # single-read part gets 0
    hq2, _, _ = get_hapq([{0}], [(1, 6)], frags, gp, 1000)
    assert hq2[0] == 0
