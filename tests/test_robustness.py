"""Degenerate-input and extreme-parameter robustness.

The reference driver (bin/floria.rs:204-391) tolerates contigs with no
usable SNPs, empty BAMs, absent -G contigs, ploidy 1, beam width 1 and
near-zero epsilon without crashing (it skips or degrades gracefully).
Pin the same behavior end to end: every probe must complete and leave a
well-formed output directory.
"""

import gzip
import os

import pytest

from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim import bamwrite


def _run(sim_dir, out_dir, **kw):
    opts = Options(bam_file=kw.pop("bam", os.path.join(sim_dir, "sim.bam")),
                   vcf_file=kw.pop("vcf", os.path.join(sim_dir, "sim.vcf")),
                   reference_fasta=os.path.join(sim_dir, "sim.fa"),
                   out_dir=str(out_dir), overwrite=True,
                   snp_count_filter=kw.pop("snp_count_filter", 5), **kw)
    run(opts)
    return opts


def test_header_only_vcf_skips_contig(small_sim, tmp_path):
    _cfg, _truth, sim = small_sim
    vcf0 = tmp_path / "empty.vcf"
    with open(os.path.join(sim, "sim.vcf")) as fh, open(vcf0, "w") as out:
        for line in fh:
            if line.startswith("#"):
                out.write(line)
    _run(sim, tmp_path / "out", vcf=str(vcf0))
    # Contig skipped: no per-contig dir (the summary TSV header is the
    # CLI layer's job, parse_cmd_line.rs:129-135 == cli.py).
    assert not os.path.exists(tmp_path / "out" / "sim_contig")


def test_alignment_free_bam_skips_contig(small_sim, tmp_path):
    cfg, _truth, sim = small_sim
    bam0 = tmp_path / "empty.bam"
    bamwrite.write_bam(str(bam0), [(cfg.contig_name, cfg.contig_len)], [])
    _run(sim, tmp_path / "out", bam=str(bam0))
    assert not os.path.exists(tmp_path / "out" / cfg.contig_name)


def test_absent_contig_in_list(small_sim, tmp_path):
    _cfg, _truth, sim = small_sim
    _run(sim, tmp_path / "out", list_to_phase=["not_a_contig"])


@pytest.mark.parametrize("kw", [
    dict(max_ploidy=1),
    dict(max_number_solns=1),
    dict(epsilon=1e-9),
    dict(snp_density=1e-9),
    dict(block_length=50),
    dict(mapq_cutoff=255),
    dict(stopping_heuristic=False),
    dict(use_qual_scores=True),
], ids=["ploidy1", "beam1", "eps0", "density0", "tiny_block",
        "mapq255", "no_stop", "qual_scores"])
def test_extreme_params_complete(small_sim, tmp_path, kw):
    cfg, _truth, sim = small_sim
    _run(sim, tmp_path / "out", **kw)
    if "mapq_cutoff" in kw:
        return  # every read filtered: contig legitimately skipped
    vt = tmp_path / "out" / cfg.contig_name / f"{cfg.contig_name}.vartigs"
    assert os.path.exists(vt)
    # Output sanity, not just completion: well-formed vartig records
    # (header + allele string pairs) with in-range SNP coordinates.
    lines = [ln for ln in vt.read_text().splitlines() if ln]
    assert lines and len(lines) % 2 == 0
    for hdr, seq in zip(lines[::2], lines[1::2]):
        assert hdr.startswith(">") and cfg.contig_name in hdr
        assert seq and all(c.isdigit() or c == "?" for c in seq)
    hs = (tmp_path / "out" / cfg.contig_name
          / f"{cfg.contig_name}.haplosets")
    members = [ln for ln in hs.read_text().splitlines()
               if ln and not ln.startswith(">")]
    assert members, "no reads assigned to any haploset"


def _corrupt_cigar_bam(sim, out_path, contig, contig_len):
    """Rebuild sim.bam with one record whose CIGAR (5000M) overruns its
    100-base sequence inserted mid-file."""
    from floria_tpu.ingest.bam import BamFile

    bf = BamFile(os.path.join(sim, "sim.bam"))
    records = []
    for rec in bf.fetch(contig):
        cigar = [(int(ln), "MIDNSHP=X"[int(op)])
                 for op, ln in zip(*rec.cigar_ops())]
        records.append(bamwrite.encode_record(
            rec.qname, rec.flag, 0, rec.pos, rec.mapq, cigar,
            rec.seq.tobytes(), list(rec.qual)))
    bad = bamwrite.encode_record("bad_cigar_read", 0, 0, 50, 60,
                                 [(5000, "M")], b"ACGT" * 25, [30] * 100)
    records.insert(min(3, len(records)), bad)
    bamwrite.write_bam(str(out_path), [(contig, contig_len)], records)
    return len(records) - 1  # number of good records


def test_truncated_bgzf_bam_fails_loudly(small_sim, tmp_path):
    """A BAM cut mid-BGZF-member must raise, not hang or emit output
    (the reference's htslib layer fails the same way,
    file_reader.rs:125)."""
    _cfg, _truth, sim = small_sim
    raw = open(os.path.join(sim, "sim.bam"), "rb").read()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(raw[:len(raw) // 2])
    with pytest.raises(ValueError, match="truncated BGZF"):
        _run(sim, tmp_path / "out", bam=str(trunc))
    assert not os.path.exists(tmp_path / "out" / "sim_contig")


def test_truncated_gzip_vcf_fails_loudly(small_sim, tmp_path):
    from floria_tpu.ingest import bgzf

    _cfg, _truth, sim = small_sim
    vcf = open(os.path.join(sim, "sim.vcf"), "rb").read()
    gz = bgzf.compress(vcf)
    trunc = tmp_path / "trunc.vcf.gz"
    trunc.write_bytes(gz[:len(gz) // 2])
    with pytest.raises(ValueError, match="truncated BGZF"):
        _run(sim, tmp_path / "out", vcf=str(trunc))


@pytest.mark.parametrize("payload", [
    b"\x00\x01garbage bytes that are neither gzip nor BAM" * 64,
    gzip.compress(b"plain text, valid gzip, not a BAM payload"),
], ids=["raw_garbage", "gzip_non_bam"])
def test_non_bam_magic_fails_loudly(small_sim, tmp_path, payload):
    _cfg, _truth, sim = small_sim
    bad = tmp_path / "bad.bam"
    bad.write_bytes(payload)
    with pytest.raises(ValueError, match="not a BAM file"):
        _run(sim, tmp_path / "out", bam=str(bad))


def test_vcf_ghost_contig_warns_and_is_ignored(small_sim, tmp_path,
                                               caplog):
    """VCF records on contigs absent from the BAM header (e.g. a
    'chr1' vs '1' naming mismatch) must warn, not vanish silently;
    the real contig still phases."""
    import logging

    cfg, _truth, sim = small_sim
    vcf = open(os.path.join(sim, "sim.vcf")).read()
    ghost = (vcf.replace("#CHROM", "##contig=<ID=ghost_contig>\n#CHROM")
             + "ghost_contig\t100\t.\tA\tC\t60\tPASS\t.\n")
    gpath = tmp_path / "ghost.vcf"
    gpath.write_text(ghost)
    with caplog.at_level(logging.WARNING, logger="floria_tpu"):
        _run(sim, tmp_path / "out", vcf=str(gpath))
    assert any("ghost_contig" in r.message for r in caplog.records)
    assert os.path.exists(tmp_path / "out" / cfg.contig_name
                          / f"{cfg.contig_name}.vartigs")


def test_cigar_overrun_record_skipped_e2e(small_sim, tmp_path, caplog):
    """A record whose CIGAR overruns its sequence is dropped with a
    warning; the remaining reads phase normally and the bad read never
    reaches an output (wrong-allele extraction would otherwise read the
    NEXT record's bytes)."""
    import logging

    cfg, _truth, sim = small_sim
    bam = tmp_path / "badcigar.bam"
    _corrupt_cigar_bam(sim, bam, cfg.contig_name, cfg.contig_len)
    with caplog.at_level(logging.WARNING, logger="floria_tpu"):
        _run(sim, tmp_path / "out", bam=str(bam))
    assert any("corrupt CIGAR" in r.message for r in caplog.records)
    hs = (tmp_path / "out" / cfg.contig_name
          / f"{cfg.contig_name}.haplosets")
    txt = hs.read_text()
    assert "bad_cigar_read" not in txt
    assert sum(1 for ln in txt.splitlines()
               if ln and not ln.startswith(">")) > 0


def test_cigar_overrun_dropped_by_both_decoders(small_sim, tmp_path):
    """Unit-level: FastBam (native scan) and BamFile (pure) both drop
    the corrupt record and keep every valid one."""
    from floria_tpu.ingest.bam import BamFile

    cfg, _truth, sim = small_sim
    bam = tmp_path / "badcigar.bam"
    n_good = _corrupt_cigar_bam(sim, bam, cfg.contig_name,
                                cfg.contig_len)
    pure = BamFile(str(bam))
    pure_recs = pure.fetch(cfg.contig_name)
    assert len(pure_recs) == n_good
    assert all(r.qname != "bad_cigar_read" for r in pure_recs)
    try:
        from floria_tpu.ingest.fastingest import FastBam

        fast = FastBam(str(bam))
    except RuntimeError:
        pytest.skip("native library unavailable")
    assert fast.n_records == n_good
    assert all(fast.qname(i) != "bad_cigar_read"
               for i in range(fast.n_records))


def test_bam_payload_truncated_mid_record_fails_loudly(small_sim,
                                                       tmp_path):
    """Valid BGZF wrapping a BAM payload cut mid-record: the decoder
    must raise, not read past the end."""
    from floria_tpu.ingest import bgzf
    from floria_tpu.ingest.bam import BamFile

    _cfg, _truth, sim = small_sim
    payload = bgzf.read_file(os.path.join(sim, "sim.bam"))
    cut = tmp_path / "cut.bam"
    cut.write_bytes(bgzf.compress(bytes(payload[:len(payload) - 37])))
    with pytest.raises(ValueError, match="malformed BAM"):
        list(BamFile(str(cut)).iter_records())


def test_gzip_read_outputs(small_sim, tmp_path):
    cfg, _truth, sim = small_sim
    _run(sim, tmp_path / "out", output_reads=True, gzip=True,
         trim_reads=True)
    lr = tmp_path / "out" / cfg.contig_name / "long_reads"
    fq = sorted(os.listdir(lr))
    assert fq and all(f.endswith(".gz") for f in fq)
    with gzip.open(lr / fq[0], "rt") as fh:
        assert fh.readline().startswith("@")
