"""Validation on reference-shaped data (VERDICT r2 #5).

Every other correctness/perf workload comes from the uniform simulator.
The reference ships a REAL Longshot VCF — 954 SNVs with real spacing on
the 5,246,481 bp Klebsiella contig NZ_CP081897.1
(/root/reference/tests/test.vcf; its BAM/FASTA blobs are stripped from
this snapshot, .MISSING_LARGE_BLOBS, so bit-identity vs Rust floria is
unreachable) — and the closest reachable workload is simulating strain
reads against those true positions: a dense ~118 kb strain-variable
island (median SNV gap 51 bp, max 1.6 kb) — the real, non-uniform
shape the tool quick-starts on (README.md:66-75).
"""

import os

import numpy as np
import pytest

import oracle_pipeline
from test_pipeline_oracle import _ingest_like_pipeline
from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim.simulate import SimConfig, simulate

_REF_VCF = "/root/reference/tests/test.vcf"


def _real_positions():
    """0-based SNV positions from the reference's shipped VCF (data
    only — positions; alleles/reads are simulated)."""
    pos = []
    with open(_REF_VCF) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.split("\t", 5)
            if len(f[3]) == 1 and len(f[4]) == 1:
                pos.append(int(f[1]) - 1)
    return pos


@pytest.mark.skipif(not os.path.exists(_REF_VCF),
                    reason="reference checkout not mounted")
def test_reference_shaped_klebsiella(tmp_path):
    positions = _real_positions()
    assert len(positions) == 954
    # The real SNVs are NOT uniform: they cluster in a ~118 kb
    # strain-variable island (median gap 51 bp, max 1.6 kb) of the
    # 5.25 Mbp contig — precisely the non-uniform shape the in-repo
    # simulator never draws. Keep the exact spacing, trim the SNP-free
    # desert around the island (plus a 25 kb flank) so the test stays
    # minutes, not tens of minutes.
    lo = min(positions)
    positions = [p - lo + 25_000 for p in positions]
    contig_len = max(positions) + 25_000
    cfg = SimConfig(contig_name="NZ_CP081897.1", contig_len=contig_len,
                    num_strains=3, snp_positions=positions,
                    coverage_per_strain=10.0, read_length=9_000,
                    read_length_sd=1_500.0, error_rate=0.02, seed=33)
    sim_dir = tmp_path / "sim"
    truth = simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "out"
    opts = Options(
        bam_file=os.path.join(str(sim_dir), "sim.bam"),
        vcf_file=os.path.join(str(sim_dir), "sim.vcf"),
        reference_fasta=os.path.join(str(sim_dir), "sim.fa"),
        out_dir=str(out_dir), overwrite=True)
    os.makedirs(out_dir, exist_ok=True)
    run(opts)

    contig = cfg.contig_name
    cdir = os.path.join(str(out_dir), contig)
    with open(os.path.join(cdir, f"{contig}.vartigs")) as f:
        got_vartigs = f.read()
    with open(os.path.join(cdir, f"{contig}.haplosets")) as f:
        got_haplosets = f.read()
    assert got_vartigs.startswith(">HAP")

    # Byte-parity with the independent oracle pipeline on this real
    # SNP layout (same contract as tests/test_pipeline_oracle.py).
    frags, _nosnp, cv = _ingest_like_pipeline(opts, contig)
    parts, ranges, hapqs, rel, _avg = oracle_pipeline.phase_contig(
        frags, cv.genome_pos, opts)
    want_vartigs = oracle_pipeline.vartigs_text(
        parts, ranges, cdir, contig, frags, cv.genome_pos, hapqs, rel)
    want_haplosets = oracle_pipeline.haplosets_text(
        parts, ranges, cdir, contig, frags, cv.genome_pos, hapqs, rel)
    assert got_vartigs == want_vartigs
    assert got_haplosets == want_haplosets

    # Accuracy readout: haploset purity against the simulated truth
    # (9 kb reads over a dense island = strong linkage). The bound is a
    # sanity floor, not a target; the measured value is recorded in
    # VALIDATION.md.
    member_strain = []
    cur = []
    groups = []
    with open(os.path.join(cdir, f"{contig}.haplosets")) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    groups.append(cur)
                cur = []
            elif line.strip():
                rid = line.split("\t")[0]
                cur.append(truth.read_strains[rid])
    if cur:
        groups.append(cur)
    pure = sum(max(np.bincount(g).max(), 0) for g in groups if g)
    total = sum(len(g) for g in groups)
    assert total > 300
    purity = pure / total
    print(f"reference-shaped purity: {purity:.3f} over {total} reads "
          f"in {len(groups)} haplosets")
    # Measured 1.000 over 464 reads in 3 haplosets (VALIDATION.md);
    # floor = measured - 5% so a catastrophic-quality regression fails
    # loudly (VERDICT r3 #4), plus a haploset-count band so a
    # strain-splitting (or total-merge) regression fails too.
    assert purity >= 0.95
    assert 3 <= len(groups) <= 6, len(groups)
