"""End-to-end coverage of the beta/hidden CLI paths that previously had
only unit tests: hybrid short-read polishing (-H, floria.rs:79-84 +
utils_frags.rs:492-574), short-read re-attachment (--reassign-short,
part_block_manip.rs:235-270), coverage binning (--bin-by-cov,
part_block_manip.rs:290-452), and quality-weighted alleles (-q,
file_reader.rs:609-625)."""

import os

import numpy as np
import pytest

from floria_tpu.constants import CONTIG_PLOIDY_HEADER
from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim.simulate import SimConfig, simulate, simulate_hybrid


def _run(sim_dir, out_dir, **kw):
    opts = Options(
        bam_file=os.path.join(sim_dir, "sim.bam"),
        vcf_file=os.path.join(sim_dir, "sim.vcf"),
        reference_fasta=os.path.join(sim_dir, "sim.fa"),
        out_dir=str(out_dir), epsilon=kw.pop("epsilon", 0.02),
        block_length=kw.pop("block_length", 5000),
        snp_count_filter=10, overwrite=True, **kw)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "contig_ploidy_info.tsv"), "w") as f:
        f.write(CONTIG_PLOIDY_HEADER)
    run(opts)
    return opts


def _parse_haplosets(path):
    groups = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">HAP"):
                groups.append((line, []))
            elif line:
                groups[-1][1].append(line.split("\t")[0])
    return groups


@pytest.fixture(scope="module")
def hybrid_run(tmp_path_factory):
    cfg = SimConfig(contig_len=40_000, num_strains=2, num_snps=150,
                    coverage_per_strain=12.0, read_length=5_000,
                    read_length_sd=800.0, error_rate=0.015, seed=31)
    sim_dir = str(tmp_path_factory.mktemp("hybrid_sim"))
    truth = simulate_hybrid(cfg, sim_dir, short_coverage_per_strain=15.0)
    out_dir = str(tmp_path_factory.mktemp("hybrid_out"))
    opts = _run(sim_dir, out_dir, hybrid=True, reassign_short=True,
                short_bam_file=os.path.join(sim_dir, "sim_short.bam"))
    return cfg, truth, out_dir, opts


def test_hybrid_outputs_and_purity(hybrid_run):
    cfg, truth, out_dir, opts = hybrid_run
    cdir = os.path.join(out_dir, cfg.contig_name)
    assert os.path.exists(
        os.path.join(cdir, f"{cfg.contig_name}.vartigs"))
    groups = _parse_haplosets(
        os.path.join(cdir, f"{cfg.contig_name}.haplosets"))
    assert groups
    # Long reads inside one haploset should mostly share a strain even
    # after the short-read polish rewrote some of their SNP calls.
    purities, sizes = [], []
    for _header, read_ids in groups:
        longs = [r for r in read_ids if r.startswith("read_")]
        if len(longs) < 3:
            continue
        strains = [truth.read_strains[r] for r in longs]
        top = max(np.bincount(strains))
        purities.append(top / len(strains))
        sizes.append(len(strains))
    assert purities
    weighted_purity = np.average(purities, weights=sizes)
    print(f"hybrid haploset weighted purity: {weighted_purity:.4f}")
    # Measured 1.0000 (floor = measured - 5%, VERDICT r3 #4).
    assert weighted_purity >= 0.95, purities


def test_hybrid_reassigns_short_reads(hybrid_run):
    cfg, truth, out_dir, opts = hybrid_run
    cdir = os.path.join(out_dir, cfg.contig_name)
    groups = _parse_haplosets(
        os.path.join(cdir, f"{cfg.contig_name}.haplosets"))
    shorts = [(h, r) for h, ids in groups for r in ids
              if r.startswith("pair_h")]
    # --reassign-short must re-attach short pairs to final haplogroups
    # (part_block_manip.rs:235-270).
    assert shorts, "no short reads re-attached to haplosets"
    # And they should mostly land on a haploset dominated by their own
    # strain.
    agree = total = 0
    for header, read_ids in groups:
        longs = [r for r in read_ids if r.startswith("read_")]
        if len(longs) < 3:
            continue
        top_strain = np.bincount(
            [truth.read_strains[r] for r in longs]).argmax()
        for r in read_ids:
            if r.startswith("pair_h"):
                total += 1
                agree += int(truth.read_strains[r] == top_strain)
    assert total > 0
    assert agree / total > 0.8, (agree, total)


def test_bin_by_cov_writes_debug_clusters(tmp_path):
    cfg = SimConfig(contig_len=30_000, num_strains=2, num_snps=120,
                    coverage_per_strain=10.0, read_length=4_000,
                    read_length_sd=500.0, error_rate=0.01,
                    strain_abundances=[1.0, 3.0], seed=37)
    sim_dir = tmp_path / "bin_sim"
    simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "bin_out"
    _run(str(sim_dir), str(out_dir), do_binning=True)
    cdir = os.path.join(str(out_dir), cfg.contig_name)
    assert os.path.exists(os.path.join(cdir, f"{cfg.contig_name}.vartigs"))
    # part_block_manip.rs:420-421 dumps the final cluster list.
    dbg = os.path.join(cdir, "debug_clusters.txt")
    assert os.path.exists(dbg)
    text = open(dbg).read()
    assert text.startswith("[") and text.endswith("]")


def test_qual_scores_end_to_end(tmp_path):
    cfg = SimConfig(contig_len=30_000, num_strains=2, num_snps=120,
                    coverage_per_strain=12.0, read_length=4_000,
                    read_length_sd=500.0, error_rate=0.01, seed=41)
    sim_dir = tmp_path / "q_sim"
    truth = simulate(cfg, str(sim_dir))
    out_dir = tmp_path / "q_out"
    _run(str(sim_dir), str(out_dir), use_qual_scores=True)
    cdir = os.path.join(str(out_dir), cfg.contig_name)
    groups = _parse_haplosets(
        os.path.join(cdir, f"{cfg.contig_name}.haplosets"))
    assert groups
    purities, sizes = [], []
    for _header, read_ids in groups:
        if len(read_ids) < 3:
            continue
        strains = [truth.read_strains[r] for r in read_ids]
        purities.append(max(np.bincount(strains)) / len(strains))
        sizes.append(len(strains))
    assert purities
    weighted_purity = np.average(purities, weights=sizes)
    print(f"qual-scores haploset weighted purity: {weighted_purity:.4f}")
    # Measured 1.0000 (floor = measured - 5%, VERDICT r3 #4).
    assert weighted_purity >= 0.95, purities
