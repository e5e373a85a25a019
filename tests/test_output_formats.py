"""Byte-exact golden tests of the output writers on a tiny deterministic
case — guards the reference format parity (file_writer.rs:699-993)."""

import os

import numpy as np

from floria_tpu.frag import Frag
from floria_tpu.options import Options
from floria_tpu.out.writers import write_outputs


def _frag(counter, name, sites, qual=30):
    f = Frag(name, counter, False)
    for i, (snp, allele) in enumerate(sites.items()):
        f.add_site(snp, allele, qual, 0, i)
    f.seq_string[0] = b"ACGTACGT"
    f.qual_string[0] = b"IIIIIIII"
    f.freeze()
    return f


def test_golden_formats(tmp_path):
    frags = [
        _frag(0, "readA", {1: 0, 2: 0, 3: 1}),
        _frag(1, "readB", {1: 0, 2: 0, 3: 1}),
        _frag(2, "readC", {2: 0, 3: 1, 4: 0}),
        _frag(3, "readD", {1: 1, 2: 1, 3: 0}),
        _frag(4, "readE", {1: 1, 2: 1, 3: 0, 4: 1}),
        _frag(5, "readF", {2: 1, 3: 0, 4: 1}),
    ]
    parts = [{0, 1, 2}, {3, 4, 5}]
    ranges = [(1, 4), (1, 4)]
    gp = np.array([100, 200, 300, 400])
    out = str(tmp_path / "golden")
    os.makedirs(out)
    opts = Options(out_dir=str(tmp_path), block_length=500)
    with open(tmp_path / "contig_ploidy_info.tsv", "w") as f:
        from floria_tpu.constants import CONTIG_PLOIDY_HEADER
        f.write(CONTIG_PLOIDY_HEADER)
    write_outputs(parts, ranges, out, "ctg", frags, gp, opts, [], 1000)

    vartigs = open(os.path.join(out, "ctg.vartigs")).read()
    # w = 1 - 10^-3 per base; sums make consensus deterministic.
    assert vartigs.splitlines()[1] == "0010"
    assert vartigs.splitlines()[3] == "1101"
    h0 = vartigs.splitlines()[0].split("\t")
    assert h0[0] == f">HAP0.{out}"
    assert h0[1] == "CONTIG:ctg"
    assert h0[2] == "SNPRANGE:1-4"
    assert h0[3] == "BASERANGE:101-401"
    # COV: mean unweighted support over nonzero sites = (2+3+3+1)/4
    assert h0[4] == "COV:2.250"
    assert h0[5] == "ERR:0.0000"
    assert h0[7] == "REL_ERR:nan" or h0[7].startswith("REL_ERR:")

    info = open(os.path.join(out, "vartig_info.txt")).read().splitlines()
    assert info[0] == f">HAP0.{out}\tSNPRANGE:1-4"
    assert info[1] == "1:100\t0\t0:2\t"
    assert info[2] == "2:200\t0\t0:3\t"
    assert info[3] == "3:300\t1\t1:3\t"
    assert info[4] == "4:400\t0\t0:1\t"

    hs = open(os.path.join(out, "ctg.haplosets")).read().splitlines()
    assert hs[0].startswith(f">HAP0.{out}\tCONTIG:ctg\tSNPRANGE:1-4\t"
                            "BASERANGE:101-401\t")
    assert hs[1] == "readA\t1\t3"
    assert hs[2] == "readB\t1\t3"
    assert hs[3] == "readC\t2\t4"

    ploidy = open(tmp_path / "contig_ploidy_info.tsv").read().splitlines()
    fields = ploidy[1].split("\t")
    assert fields[0] == "ctg"
    assert fields[1] == "2.000"          # both groups span all 4 SNPs
    assert fields[4] == "600"            # 2 * (401-101) bases covered
