"""Short-read (paired-end) mode end-to-end test — the reference's
test_short.bam configuration analog."""

import os

import numpy as np

from floria_tpu.constants import CONTIG_PLOIDY_HEADER
from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim.simulate import SimConfig, simulate


def test_paired_end_pipeline(tmp_path):
    cfg = SimConfig(contig_len=20_000, num_strains=2, num_snps=200,
                    coverage_per_strain=20.0, read_length=250,
                    error_rate=0.005, paired=True, insert_size=300,
                    seed=31)
    sim_dir = tmp_path / "sim_pe"
    truth = simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "out_pe"
    os.makedirs(out_dir)
    with open(out_dir / "contig_ploidy_info.tsv", "w") as f:
        f.write(CONTIG_PLOIDY_HEADER)
    opts = Options(
        bam_file=str(sim_dir / "sim.bam"),
        vcf_file=str(sim_dir / "sim.vcf"),
        reference_fasta=str(sim_dir / "sim.fa"),
        out_dir=str(out_dir), epsilon=0.01, block_length=2000,
        snp_count_filter=10, overwrite=True, output_reads=True)
    run(opts)

    cdir = out_dir / cfg.contig_name
    vartigs = (cdir / f"{cfg.contig_name}.vartigs").read_text()
    assert vartigs.startswith(">HAP")
    # Paired reads must have been merged: haploset read names unique.
    names = [l.split("\t")[0]
             for l in (cdir / f"{cfg.contig_name}.haplosets")
             .read_text().splitlines() if not l.startswith(">")]
    assert len(names) == len(set(names))
    # Paired fastq outputs exist for at least one haploset.
    shorts = list((cdir / "short_reads").glob("*_paired1.fastq"))
    assert shorts, "no paired fastq written"
    r1 = shorts[0].read_text().splitlines()
    assert r1[0].startswith("@") and r1[0].endswith("/1")
