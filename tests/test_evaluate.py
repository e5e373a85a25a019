"""Tests for the simulated-truth evaluation utilities."""

import numpy as np

from floria_tpu.sim.evaluate import (HaplosetEval, VartigEval,
                                     evaluate_haplosets,
                                     evaluate_vartigs)
from floria_tpu.sim.simulate import SimTruth


def _truth():
    return SimTruth(
        snp_positions=np.arange(10) * 100,
        strain_alleles=np.array([[0] * 10, [1] * 10]),
        read_strains={"r0": 0, "r1": 0, "r2": 1, "r3": 1})


def test_evaluate_vartigs(tmp_path):
    p = tmp_path / "v.vartigs"
    p.write_text(
        ">HAP0.x\tCONTIG:c\tSNPRANGE:1-5\tBASERANGE:1-401\tCOV:3.0\t"
        "ERR:0.01\tHAPQ:30\tREL_ERR:1.0\n"
        "00000\n"
        ">HAP1.x\tCONTIG:c\tSNPRANGE:6-10\tBASERANGE:501-901\tCOV:3.0\t"
        "ERR:0.01\tHAPQ:30\tREL_ERR:1.0\n"
        "111?0\n")
    ev = evaluate_vartigs(str(p), _truth())
    assert ev.num_vartigs == 2
    # vartig 1 perfect vs strain 0; vartig 2: 3 match strain 1, last
    # mismatches both strains at one covered site -> 3/4 best
    assert ev.weighted_accuracy == (5 * 1.0 + 4 * 0.75) / 9
    assert ev.total_span == 9
    assert ev.covered_fraction == 0.9


def test_evaluate_haplosets(tmp_path):
    p = tmp_path / "h.haplosets"
    p.write_text(
        ">HAP0.x\theader\nr0\t1\t5\nr1\t1\t5\n"
        ">HAP1.x\theader\nr2\t6\t9\nr3\t6\t9\n")
    ev = evaluate_haplosets(str(p), _truth())
    assert ev.num_groups == 2
    assert ev.weighted_purity == 1.0
    assert ev.n50_reads == 2
