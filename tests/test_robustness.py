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


def test_gzip_read_outputs(small_sim, tmp_path):
    cfg, _truth, sim = small_sim
    _run(sim, tmp_path / "out", output_reads=True, gzip=True,
         trim_reads=True)
    lr = tmp_path / "out" / cfg.contig_name / "long_reads"
    fq = sorted(os.listdir(lr))
    assert fq and all(f.endswith(".gz") for f in fq)
    with gzip.open(lr / fq[0], "rt") as fh:
        assert fh.readline().startswith("@")
