"""Ingest layer tests: BGZF, BAM codec round-trip, VCF parsing, fragment
extraction semantics (filters, allele matching, pair merging)."""

import numpy as np
import pytest

from floria_tpu.ingest import bam as bamlib
from floria_tpu.ingest import bgzf, vcf
from floria_tpu.ingest.fragments import (alignment_passed_check,
                                         combine_frags, frag_from_record,
                                         get_frags_from_bam)
from floria_tpu.options import Options
from floria_tpu.sim import bamwrite
from floria_tpu.sim.simulate import SimConfig, simulate


def test_bgzf_roundtrip():
    payload = bytes(range(256)) * 1000
    comp = bgzf.compress(payload)
    assert bgzf.decompress(comp) == payload


def test_bam_roundtrip(tmp_path):
    rec = bamwrite.encode_record("r1", 0, 0, 100, 60, [(8, "M")],
                                 b"ACGTACGT", [30] * 8)
    path = str(tmp_path / "t.bam")
    bamwrite.write_bam(path, [("c1", 1000)], [rec])
    bf = bamlib.BamFile(path)
    assert bf.references == ["c1"]
    recs = bf.fetch("c1")
    assert len(recs) == 1
    r = recs[0]
    assert r.qname == "r1" and r.pos == 100 and r.mapq == 60
    assert r.seq.tobytes() == b"ACGTACGT"
    assert list(r.qual) == [30] * 8
    assert r.reference_end() == 108


def test_aligned_snp_pairs_with_indels(tmp_path):
    # read: 4M 2I 3M 2D 4M starting at ref pos 10
    # ref coverage: 10-13 (q0-3), 14-16 (q6-8), 17-18 deleted, 19-22 (q9-12)
    rec = bamwrite.encode_record(
        "r", 0, 0, 10, 60, [(4, "M"), (2, "I"), (3, "M"), (2, "D"),
                            (4, "M")], b"AAAACCGGGTTTT", [20] * 13)
    path = str(tmp_path / "i.bam")
    bamwrite.write_bam(path, [("c", 100)], [rec])
    r = bamlib.BamFile(path).fetch("c")[0]
    snps = np.array([11, 15, 17, 20], dtype=np.int64)
    qpos, rpos = bamlib.aligned_snp_pairs(r, snps)
    # SNP 17 falls in the deletion -> no pair.
    assert list(rpos) == [11, 15, 20]
    assert list(qpos) == [1, 7, 10]


def test_vcf_parse(tmp_path):
    p = tmp_path / "t.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "c1\t5\t.\tA\tT\t60\tPASS\t.\n"
        "c1\t9\t.\tAC\tT\t60\tPASS\t.\n"    # not a SNP (multibase)
        "c1\t12\t.\tG\tN\t60\tPASS\t.\n"    # non-ACGT
        "c1\t20\t.\tC\tG,T\t60\tPASS\t.\n"  # triallelic SNP
        "c2\t3\t.\tT\tA\t60\tPASS\t.\n")
    prof = vcf.read_vcf(str(p))
    c1 = prof.get("c1")
    assert list(c1.genome_pos) == [4, 19]
    assert c1.pos_allele_map[4] == b"AT"
    assert c1.pos_allele_map[19] == b"CGT"
    assert c1.pos_to_snp == {4: 1, 19: 2}
    assert prof.get("c2").num_snps == 1


def test_alignment_passed_check():
    # primary below cutoff
    assert alignment_passed_check(0, 10, True, True, 15) == (False, False)
    # primary above cutoff
    assert alignment_passed_check(0, 20, True, True, 15) == (True, False)
    # secondary rejected
    assert alignment_passed_check(256, 60, True, True, 15) == (False, False)
    # duplicate rejected (errors mask)
    assert alignment_passed_check(1024, 60, True, True, 15) == (False, False)
    # paired supplementary always rejected
    assert alignment_passed_check(2048 | 64, 60, True, True, 15) == (
        False, True)
    # long-read supplementary needs mapq 60
    assert alignment_passed_check(2048, 59, True, True, 15) == (False, True)
    assert alignment_passed_check(2048, 60, True, True, 15) == (True, True)
    # supplementary with use_supplementary=False rejected
    assert alignment_passed_check(2048, 60, False, True, 15) == (False, True)


def _contig_vcf(positions, alleles):
    gp = np.asarray(positions, dtype=np.int64)
    return vcf.ContigVcf(
        genome_pos=gp,
        pos_allele_map={int(p): a for p, a in zip(positions, alleles)},
        pos_to_snp={int(p): i + 1 for i, p in enumerate(positions)})


def test_frag_from_record(tmp_path):
    # SNPs at 12 (A/T) and 14 (C/G); read bases T at 12, C at 14.
    cv = _contig_vcf([12, 14, 16], [b"AT", b"CG", b"AC"])
    rec = bamwrite.encode_record("r", 0, 0, 10, 60, [(10, "M")],
                                 b"AATACAGGGG", [25] * 10)
    path = str(tmp_path / "f.bam")
    bamwrite.write_bam(path, [("c", 100)], [rec])
    r = bamlib.BamFile(path).fetch("c")[0]
    frag = frag_from_record(r, cv, 0)
    # SNP counters are 1-based: T at snp1 -> allele 1, C at snp2 -> allele 0,
    # G at snp3 matches neither A nor C -> dropped.
    assert frag.seq_dict == {1: 1, 2: 0}
    assert frag.qual_dict == {1: 25, 2: 25}
    assert frag.first_position == 1 and frag.last_position == 2
    assert frag.snp_pos_to_seq_pos == {1: (0, 2), 2: (0, 4)}
    assert frag.first_pos_base == 10 and frag.last_pos_base == 20


def test_combine_pairs():
    cv = _contig_vcf([10, 20, 30], [b"AT", b"CG", b"AC"])
    opts = Options()
    f1 = _mk_frag("p", 0, {1: 0, 2: 1}, paired=True)
    f2 = _mk_frag("p", 1, {2: 0, 3: 1}, paired=True)
    out = combine_frags({"p": [(64 | 1, f1), (128 | 1, f2)]}, cv, opts)
    assert len(out) == 1
    m = out[0]
    # Mate 2 overwrites the shared SNP 2.
    assert m.seq_dict == {1: 0, 2: 0, 3: 1}
    assert m.first_position == 1 and m.last_position == 3
    assert m.snp_pos_to_seq_pos[3][0] == 1  # moved to pair index 1


def test_combine_supplementary_distance_cutoff():
    cv = _contig_vcf([100, 200, 90_000], [b"AT", b"CG", b"AC"])
    opts = Options(supp_aln_dist_cutoff=40_000)
    prim = _mk_frag("s", 0, {1: 0, 2: 1}, paired=False)
    supp = _mk_frag("s", 1, {3: 1}, paired=False)
    out = combine_frags({"s": [(0, prim), (2048, supp)]}, cv, opts)
    # Gap 90_000 - 200 > 40_000 -> primary only.
    assert len(out) == 1 and out[0].seq_dict == {1: 0, 2: 1}

    prim2 = _mk_frag("s2", 0, {1: 0, 2: 1}, paired=False)
    supp2 = _mk_frag("s2", 1, {3: 1}, paired=False)
    opts2 = Options(supp_aln_dist_cutoff=200_000)
    out2 = combine_frags({"s2": [(0, prim2), (2048, supp2)]}, cv, opts2)
    assert len(out2) == 1 and out2[0].seq_dict == {1: 0, 2: 1, 3: 1}


def test_only_supplementary_dropped():
    cv = _contig_vcf([100], [b"AT"])
    supp = _mk_frag("x", 0, {1: 1}, paired=False)
    out = combine_frags({"x": [(2048, supp)]}, cv, Options())
    assert out == []


def _mk_frag(name, counter, sites, paired):
    from floria_tpu.frag import Frag
    f = Frag(name, counter, paired)
    for i, (snp, allele) in enumerate(sites.items()):
        f.add_site(snp, allele, 30, 0, i)
    f.seq_string[0] = b"ACGT"
    f.qual_string[0] = b"IIII"
    return f


def test_end_to_end_extraction(small_sim):
    cfg, truth, out = small_sim
    main_bam = bamlib.BamFile(out + "/sim.bam")
    prof = vcf.read_vcf(out + "/sim.vcf")
    cv = prof.get(cfg.contig_name)
    assert cv.num_snps == cfg.num_snps
    with_snps, without = get_frags_from_bam(
        main_bam, None, cv, Options(), None, cfg.contig_name)
    assert len(with_snps) > 50
    # Each fragment's alleles should mostly agree with its strain of origin.
    agree = total = 0
    for f in with_snps[:200]:
        k = truth.read_strains[f.id]
        for snp, allele in f.seq_dict.items():
            total += 1
            # strain allele 0 = REF (allele index 0), 1 = ALT (index 1)
            agree += int(truth.strain_alleles[k][snp - 1] == allele)
    assert total > 0
    assert agree / total > 0.95


def test_autodetect_estimates_and_scales(tmp_path):
    """l/epsilon auto-detection (file_reader.rs:749-826): estimates land
    near the simulated truth, and the one-pass implementation stays fast
    on a deep BAM (round-1 version re-walked covering reads per column)."""
    import time

    from floria_tpu.ingest.autodetect import l_epsilon_auto_detect

    cfg = SimConfig(contig_len=40_000, num_strains=2, num_snps=150,
                    coverage_per_strain=40.0, read_length=4_000,
                    read_length_sd=300.0, error_rate=0.03, seed=9)
    out = tmp_path / "deep"
    simulate(cfg, str(out))
    t0 = time.time()
    est_l, est_e = l_epsilon_auto_detect(str(out / "sim.bam"))
    elapsed = time.time() - t0
    # ~80x coverage, 4kb reads on 40kb: one pass must be seconds, not
    # minutes (the quadratic version did columns x depth alignment walks).
    assert elapsed < 20.0, elapsed
    assert 3_000 <= est_l <= 5_500, est_l
    # 66th-pct column error of a 3% error sim, floored at 0.01.
    assert 0.01 <= est_e <= 0.08, est_e


def test_supp_hardclip_offset_parity(tmp_path):
    """Supplementary records with leading hard-clips: stored query
    positions are offset by the clip length into the hard-clipped
    sequence, replicating the reference quirk exactly
    (file_reader.rs:719-720) — on both the pure-Python and native
    ingest paths. Realignment then drops windows the offset pushes out
    of bounds, like alignment.rs:24-27."""
    from floria_tpu.ingest.fragments import frag_from_record
    from floria_tpu.ingest.vcf import read_vcf

    # supp flag 2048, cigar 20H 8M at pos 100; SNP at genome pos 102.
    rec = bamwrite.encode_record("s1", 2048, 0, 100, 60,
                                 [(20, "H"), (8, "M")], b"ACGTACGT",
                                 [30] * 8)
    prim = bamwrite.encode_record("s1", 0, 0, 300, 60, [(8, "M")],
                                  b"ACGTACGT", [30] * 8)
    path = str(tmp_path / "h.bam")
    bamwrite.write_bam(path, [("c1", 1000)], [rec, prim])
    vcf = tmp_path / "h.vcf"
    vcf.write_text("##fileformat=VCFv4.2\n##contig=<ID=c1>\n"
                   "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                   "c1\t103\t.\tG\tA\t50\tPASS\t.\n")  # 0-based 102
    cv = read_vcf(str(vcf), ["c1"]).get("c1")

    r = bamlib.BamFile(path).fetch("c1")[0]
    assert r.flag & 2048 and r.leading_hardclips() == 20
    frag = frag_from_record(r, cv, 0)
    # aligned query pos of genome 102 is 2; stored offset adds the clip.
    assert frag.snp_pos_to_seq_pos[1] == (0, 22)

    from floria_tpu import native
    if native.get_lib() is not None:
        from floria_tpu.ingest.fastingest import (FastBam,
                                                  extract_contig_frags)
        fb = FastBam(path)
        opts = Options(mapq_cutoff=15)
        sub = extract_contig_frags(fb, cv, opts, 0)
        supp = [f for fl, f in sub["s1"] if fl & 2048][0]
        assert supp.snp_pos_to_seq_pos[1] == (0, 22)

    # The offset pushes the window past the 8-base clipped sequence, so
    # realignment must skip this site (bounds guard), not realign a
    # misplaced window.
    from floria_tpu.kernels.realign import SnpRealigner
    realigner = SnpRealigner(b"A" * 1000, cv)
    realigner.realign(frag)
    assert not realigner.pool._q  # no job queued


def test_header_references_span_many_bgzf_members(tmp_path):
    """read_header_references must walk BGZF members correctly when the
    reference list spans several members and the file ends right after
    (regression: a fixed 64 KiB feed step overshot past later members)."""
    from floria_tpu.ingest.bam import BamFile, read_header_references
    from floria_tpu.sim import bamwrite

    path = str(tmp_path / "manyref.bam")
    refs = [(f"contig_with_a_rather_long_name_{i:04d}", 1000)
            for i in range(3000)]
    bamwrite.write_bam(path, refs, [])
    assert read_header_references(path) == BamFile(path).references
