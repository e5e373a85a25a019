"""Randomized differential fuzzing of the whole post-ingest pipeline.

Each case draws a small community config (strain count, abundances,
coverage, error rate, read shape, long/paired/split-read mode) from a
seeded RNG, simulates it, and asserts the framework's vartigs /
haplosets / vartig_info are BYTE-IDENTICAL to the independent dict/loop
oracle pipeline (tests/oracle_pipeline.py, written straight from the
reference sources). This widens the 5 hand-picked byte-parity configs of
test_pipeline_oracle.py to a reproducible random sweep over the input
space; any mismatch is a real semantics bug, never flaky noise (both
sides are deterministic given the sim seed)."""

import os

import numpy as np
import pytest

import oracle_pipeline
from test_pipeline_oracle import _ingest_like_pipeline
from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim.simulate import SimConfig, simulate


def _draw_config(seed: int) -> SimConfig:
    rng = np.random.default_rng(seed)
    num_strains = int(rng.integers(2, 5))
    mode = seed % 3  # 0 = long reads, 1 = paired short, 2 = split reads
    abundances = None
    if rng.random() < 0.5:
        raw = rng.uniform(0.5, 2.0, num_strains)
        abundances = list(raw / raw.sum())
    common = dict(
        contig_len=int(rng.integers(12_000, 22_000)),
        num_strains=num_strains,
        num_snps=int(rng.integers(70, 140)),
        error_rate=float(rng.uniform(0.005, 0.03)),
        strain_abundances=abundances,
        # Non-uniform per-base quals: phred weighting is ALWAYS on
        # (constants.rs:15 USE_QUAL_SCORES=true), so jittered quals
        # drive fractional per-site weights through scoring, the
        # integer dedup fingerprints and UPEM on both sides.
        base_qual=int(rng.integers(13, 35)),
        qual_jitter=int(rng.integers(0, 9)),
        seed=seed * 7919 + 13,
    )
    if mode == 1:
        return SimConfig(coverage_per_strain=float(rng.uniform(15, 30)),
                         read_length=int(rng.integers(120, 200)),
                         read_length_sd=10.0, paired=True,
                         insert_size=int(rng.integers(300, 600)),
                         **common)
    supp = 0.0 if mode == 0 else float(rng.uniform(0.2, 0.5))
    return SimConfig(coverage_per_strain=float(rng.uniform(7, 14)),
                     read_length=int(rng.integers(2_500, 6_000)),
                     read_length_sd=float(rng.uniform(300, 900)),
                     supp_read_fraction=supp,
                     supp_gap=int(rng.integers(1_500, 3_500)),
                     **common)


# Default 6 seeds keeps the suite fast; set FLORIA_FUZZ_SEEDS=N for a
# deeper sweep (e.g. 48 — run once per round, results in VALIDATION.md).
# Seed 19 is pinned unconditionally: its dense paired-read block
# (~1000 reads x 34 SNPs at ~400x site coverage, beam width 13) caught
# two faithful-baseline exactness bugs in round 4 (f32 FlatHap count
# rounding, epsilon narrowed to f32 at the C ABI) plus the
# separate_broken first-position sort-tie (all fixed; see VALIDATION.md
# "Deep fuzz").
_FUZZ_SEEDS = sorted(
    set(range(int(os.environ.get("FLORIA_FUZZ_SEEDS", "6")))) | {19})


@pytest.mark.parametrize("seed", _FUZZ_SEEDS)
def test_pipeline_fuzz_matches_oracle(seed, tmp_path):
    cfg = _draw_config(seed)
    sim_dir = tmp_path / "sim"
    simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "out"
    orng = np.random.default_rng(seed + 100)
    opts = Options(
        bam_file=os.path.join(str(sim_dir), "sim.bam"),
        vcf_file=os.path.join(str(sim_dir), "sim.vcf"),
        reference_fasta=os.path.join(str(sim_dir), "sim.fa"),
        out_dir=str(out_dir),
        epsilon=float(orng.uniform(0.015, 0.03)),
        block_length=int(np.random.default_rng(seed + 200).integers(
            3_000, 5_000)),
        # Widen the phasing-option space the oracle honors too: ploidy
        # sweep depth, beam width, sensitivity, and the stopping
        # heuristic (floria.rs:79-118).
        max_ploidy=int(orng.integers(3, 6)),
        max_number_solns=int(orng.integers(5, 17)),
        ploidy_sensitivity=int(orng.integers(1, 4)),
        stopping_heuristic=bool(orng.random() > 0.15),
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
    want_ploidy = oracle_pipeline.ploidy_row(
        parts, ranges, contig, frags, cv.genome_pos, hapqs, avg_err,
        cfg.contig_len)

    assert got_vartigs == want_vartigs, f"vartigs mismatch, cfg={cfg}"
    assert got_haplosets == want_haplosets, f"haplosets mismatch, cfg={cfg}"
    assert got_info == want_info, f"vartig_info mismatch, cfg={cfg}"
    assert got_ploidy == want_ploidy, f"ploidy row mismatch, cfg={cfg}"
