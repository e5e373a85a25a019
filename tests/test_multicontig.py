"""Multi-contig metagenome test: several contigs in one BAM/VCF, phased
per contig with independent output dirs (the 500-contig sharded config in
miniature), plus resume behavior and determinism."""

import os
import shutil

import numpy as np
import pytest

from floria_tpu.constants import CONTIG_PLOIDY_HEADER
from floria_tpu.ingest.fasta import write_fasta
from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim import bamwrite
from floria_tpu.sim.simulate import SimConfig, simulate


@pytest.fixture(scope="module")
def multi_sim(tmp_path_factory):
    """Three contigs, each its own 2-strain community, merged into one
    BAM/VCF/FASTA."""
    base = tmp_path_factory.mktemp("multi")
    contigs = []
    all_records = []
    fastas = {}
    vcf_lines = ["##fileformat=VCFv4.2\n"]
    refs = []
    for c in range(3):
        cfg = SimConfig(contig_name=f"ctg{c}", contig_len=12_000,
                        num_strains=2, num_snps=60,
                        coverage_per_strain=10.0, read_length=3_000,
                        read_length_sd=300.0, error_rate=0.01,
                        seed=100 + c)
        sub = base / f"sub{c}"
        simulate(cfg, str(sub))
        contigs.append(cfg)
        refs.append((cfg.contig_name, cfg.contig_len))
        from floria_tpu.ingest.bam import BamFile
        bf = BamFile(str(sub / "sim.bam"))
        fastas[cfg.contig_name] = open(sub / "sim.fa", "rb").read()
        vcf_lines.append(f"##contig=<ID={cfg.contig_name}>\n")
        for line in open(sub / "sim.vcf"):
            if not line.startswith("#"):
                vcf_lines.append(line)
        for rec in bf.fetch(cfg.contig_name):
            all_records.append((c, rec))
    # Re-encode records with correct tids.
    records = []
    for tid, rec in all_records:
        cigar = [(int(ln), "MIDNSHP=X"[int(op)])
                 for op, ln in zip(*rec.cigar_ops())]
        records.append(bamwrite.encode_record(
            rec.qname, rec.flag, tid, rec.pos, rec.mapq, cigar,
            rec.seq.tobytes(), list(rec.qual)))
    bamwrite.write_bam(str(base / "multi.bam"), refs, records)
    vcf_lines.insert(1 + len(contigs),
                     "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    (base / "multi.vcf").write_text("".join(vcf_lines))
    seqs = {}
    for name, data in fastas.items():
        seq = b"".join(l for l in data.split(b"\n")[1:])
        seqs[name] = seq
    write_fasta(str(base / "multi.fa"), seqs)
    return contigs, str(base)


def _opts(base, out_dir, **kw):
    kw.setdefault("overwrite", True)
    return Options(bam_file=base + "/multi.bam",
                   vcf_file=base + "/multi.vcf",
                   reference_fasta=base + "/multi.fa",
                   out_dir=str(out_dir), epsilon=0.02, block_length=3000,
                   snp_count_filter=10, **kw)


def _prep(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "contig_ploidy_info.tsv"), "w") as f:
        f.write(CONTIG_PLOIDY_HEADER)


def test_multi_contig(multi_sim, tmp_path):
    contigs, base = multi_sim
    out = tmp_path / "out"
    _prep(out)
    run(_opts(base, out))
    for cfg in contigs:
        assert (out / cfg.contig_name
                / f"{cfg.contig_name}.vartigs").exists()
    rows = (out / "contig_ploidy_info.tsv").read_text().splitlines()
    assert len(rows) == 1 + len(contigs)


def test_contig_restriction(multi_sim, tmp_path):
    contigs, base = multi_sim
    out = tmp_path / "out_g"
    _prep(out)
    run(_opts(base, out, list_to_phase=["ctg1"]))
    assert (out / "ctg1").exists()
    assert not (out / "ctg0").exists()


def test_resume_skips_existing(multi_sim, tmp_path):
    contigs, base = multi_sim
    out = tmp_path / "out_r"
    _prep(out)
    run(_opts(base, out, list_to_phase=["ctg0"]))
    v = out / "ctg0" / "ctg0.vartigs"
    first = v.read_text()
    stamp = v.stat().st_mtime_ns
    run(_opts(base, out, resume=True, overwrite=False))
    assert v.stat().st_mtime_ns == stamp  # untouched
    assert (out / "ctg1" / "ctg1.vartigs").exists()


def test_determinism(multi_sim, tmp_path):
    contigs, base = multi_sim
    out1 = tmp_path / "d1"
    out2 = tmp_path / "d2"
    for out in (out1, out2):
        _prep(out)
        run(_opts(base, out, list_to_phase=["ctg2"]))
    f1 = (out1 / "ctg2" / "ctg2.vartigs").read_text()
    f2 = (out2 / "ctg2" / "ctg2.vartigs").read_text()
    # Headers embed the out dir path; compare sequence lines + ranges.
    def strip(text):
        out = []
        for line in text.splitlines():
            if line.startswith(">"):
                out.append("\t".join(line.split("\t")[2:]))
            else:
                out.append(line)
        return "\n".join(out)
    assert strip(f1) == strip(f2)
