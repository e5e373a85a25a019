"""Full-pipeline oracle equality: the framework's vartigs and haplosets
must be byte-identical to the independent dict/loop oracle pipeline
(tests/oracle_pipeline.py) built straight from the reference sources —
across long-read, multi-strain, and paired short-read configs."""

import os

import pytest

import oracle_pipeline
from floria_tpu.frag import sort_and_renumber
from floria_tpu.ingest import bam as bamlib
from floria_tpu.ingest.fasta import FastaFile
from floria_tpu.ingest.fragments import (collect_contig_records,
                                         finalize_frags)
from floria_tpu.ingest.vcf import read_vcf
from floria_tpu.options import Options
from floria_tpu.pipeline import open_bam, run
from floria_tpu.sim.simulate import SimConfig, simulate

CONFIGS = {
    "long2": SimConfig(contig_len=30_000, num_strains=2, num_snps=130,
                       coverage_per_strain=10.0, read_length=4_000,
                       read_length_sd=600.0, error_rate=0.015, seed=5),
    "long3": SimConfig(contig_len=24_000, num_strains=3, num_snps=110,
                       coverage_per_strain=12.0, read_length=5_000,
                       read_length_sd=500.0, error_rate=0.01, seed=23),
    "paired2": SimConfig(contig_len=20_000, num_strains=2, num_snps=220,
                         coverage_per_strain=25.0, read_length=150,
                         read_length_sd=10.0, error_rate=0.005,
                         paired=True, insert_size=450, seed=9),
    # Split reads: primary + hard-clipped supplementary across a
    # genomic deletion (the supp-merge path, file_reader.rs:693-735).
    "supp2": SimConfig(contig_len=30_000, num_strains=2, num_snps=140,
                       coverage_per_strain=10.0, read_length=4_000,
                       read_length_sd=600.0, error_rate=0.015,
                       supp_read_fraction=0.35, supp_gap=2_500, seed=31),
}


def _ingest_like_pipeline(opts: Options, contig: str):
    """Replicates pipeline._run_group's ingest for one contig so the
    oracle runs on the exact same frozen fragments."""
    contigs = bamlib.get_contigs_to_phase(opts.bam_file)
    main_bam = open_bam(opts.bam_file)
    short_bam = (open_bam(opts.short_bam_file)
                 if opts.short_bam_file else None)
    vcf_profile = read_vcf(opts.vcf_file, contigs)
    cv = vcf_profile.get(contig)
    fasta = FastaFile(opts.reference_fasta)
    ref_seq = fasta.fetch(contig)
    id_map = collect_contig_records(main_bam, short_bam, cv, opts,
                                    ref_seq, contig)
    all_frags, frags_without_snps = finalize_frags(id_map, cv, opts)
    all_frags = sort_and_renumber(all_frags)
    for f in all_frags:
        f.freeze()
    for f in frags_without_snps:
        f.freeze()
    return all_frags, frags_without_snps, cv


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_pipeline_matches_oracle(name, tmp_path):
    cfg = CONFIGS[name]
    sim_dir = tmp_path / "sim"
    simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "out"
    opts = Options(
        bam_file=os.path.join(str(sim_dir), "sim.bam"),
        vcf_file=os.path.join(str(sim_dir), "sim.vcf"),
        reference_fasta=os.path.join(str(sim_dir), "sim.fa"),
        out_dir=str(out_dir), epsilon=0.02, block_length=4000,
        snp_count_filter=10, overwrite=True)
    os.makedirs(out_dir, exist_ok=True)
    run(opts)

    contig = cfg.contig_name
    cdir = os.path.join(str(out_dir), contig)
    with open(os.path.join(cdir, f"{contig}.vartigs")) as f:
        got_vartigs = f.read()
    with open(os.path.join(cdir, f"{contig}.haplosets")) as f:
        got_haplosets = f.read()
    with open(os.path.join(cdir, "vartig_info.txt")) as f:
        got_info = f.read()
    with open(os.path.join(str(out_dir), "contig_ploidy_info.tsv")) as f:
        got_ploidy = f.read().splitlines()[-1] + "\n"

    frags, _nosnp, cv = _ingest_like_pipeline(opts, contig)
    parts, ranges, hapqs, rel, avg_err = oracle_pipeline.phase_contig(
        frags, cv.genome_pos, opts)
    want_vartigs = oracle_pipeline.vartigs_text(
        parts, ranges, cdir, contig, frags, cv.genome_pos, hapqs, rel)
    want_haplosets = oracle_pipeline.haplosets_text(
        parts, ranges, cdir, contig, frags, cv.genome_pos, hapqs, rel)
    want_info = oracle_pipeline.vartig_info_text(
        parts, ranges, cdir, frags, cv.genome_pos)
    with open(os.path.join(str(sim_dir), "sim.fa")) as f:
        contig_len = sum(len(l.strip()) for l in f if not
                         l.startswith(">"))
    want_ploidy = oracle_pipeline.ploidy_row(
        parts, ranges, contig, frags, cv.genome_pos, hapqs, avg_err,
        contig_len)

    assert got_vartigs == want_vartigs
    assert got_haplosets == want_haplosets
    assert got_info == want_info
    assert got_ploidy == want_ploidy


def test_pipeline_matches_oracle_hybrid(tmp_path):
    """Byte parity through hybrid mode: short-read polishing
    (utils_frags.rs:492-574) + --reassign-short re-attachment
    (part_block_manip.rs:235-267) on the combined long+short id space."""
    from floria_tpu import fragops
    from floria_tpu.sim.simulate import simulate_hybrid

    cfg = SimConfig(contig_len=24_000, num_strains=2, num_snps=140,
                    coverage_per_strain=10.0, read_length=4_000,
                    read_length_sd=600.0, error_rate=0.02, seed=51)
    sim_dir = tmp_path / "sim"
    simulate_hybrid(cfg, str(sim_dir), short_coverage_per_strain=12.0)
    out_dir = tmp_path / "out"
    opts = Options(
        bam_file=os.path.join(str(sim_dir), "sim.bam"),
        vcf_file=os.path.join(str(sim_dir), "sim.vcf"),
        reference_fasta=os.path.join(str(sim_dir), "sim.fa"),
        short_bam_file=os.path.join(str(sim_dir), "sim_short.bam"),
        hybrid=True, reassign_short=True,
        out_dir=str(out_dir), epsilon=0.02, block_length=4000,
        snp_count_filter=10, overwrite=True)
    os.makedirs(out_dir, exist_ok=True)
    run(opts)

    contig = cfg.contig_name
    cdir = os.path.join(str(out_dir), contig)
    with open(os.path.join(cdir, f"{contig}.vartigs")) as f:
        got_vartigs = f.read()
    with open(os.path.join(cdir, f"{contig}.haplosets")) as f:
        got_haplosets = f.read()
    with open(os.path.join(cdir, "vartig_info.txt")) as f:
        got_info = f.read()

    all_frags, _nosnp, cv = _ingest_like_pipeline(opts, contig)
    final_frags, short_frags = fragops.hybrid_correction(all_frags)
    final_frags = sort_and_renumber(final_frags)
    combined = list(final_frags)
    for f in short_frags:
        f.counter_id = len(combined)
        combined.append(f)
    parts, ranges, hapqs, rel, _avg = oracle_pipeline.phase_contig(
        final_frags, cv.genome_pos, opts, short_frags=short_frags)
    want_vartigs = oracle_pipeline.vartigs_text(
        parts, ranges, cdir, contig, combined, cv.genome_pos, hapqs, rel)
    want_haplosets = oracle_pipeline.haplosets_text(
        parts, ranges, cdir, contig, combined, cv.genome_pos, hapqs, rel)
    want_info = oracle_pipeline.vartig_info_text(
        parts, ranges, cdir, combined, cv.genome_pos)

    # The short reads must actually flow through: at least one short
    # pair re-attached somewhere, or the parity below proves nothing
    # new.
    assert any(f.counter_id in ids for f in short_frags for ids in parts)
    assert got_vartigs == want_vartigs
    assert got_haplosets == want_haplosets
    assert got_info == want_info
