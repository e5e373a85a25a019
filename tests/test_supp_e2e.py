"""End-to-end supplementary-alignment coverage.

The simulator emits split reads (primary + hard-clipped supplementary
across a genomic deletion); the ingest path must merge each pair into ONE
fragment spanning both segments (file_reader.rs:185-235, 693-735) and the
pipeline must phase them at normal purity. Previously the supp-merge path
was only unit-tested on hand-built records.
"""

import os

import numpy as np
import pytest

from floria_tpu.options import Options
from floria_tpu.pipeline import run
from floria_tpu.sim.simulate import SimConfig, simulate


@pytest.fixture(scope="module")
def supp_sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim_supp")
    cfg = SimConfig(contig_len=40_000, num_strains=2, num_snps=200,
                    coverage_per_strain=10.0, read_length=4_000,
                    read_length_sd=500.0, error_rate=0.01,
                    supp_read_fraction=0.4, supp_gap=3_000, seed=9)
    truth = simulate(cfg, str(out))
    return cfg, truth, str(out)


def _split_read_names(sim_dir, contig):
    """Names that appear on >1 alignment record (primary + supp)."""
    from floria_tpu.ingest import bam as bamlib
    counts = {}
    for r in bamlib.BamFile(os.path.join(sim_dir, "sim.bam")).fetch(contig):
        counts[r.qname] = counts.get(r.qname, 0) + 1
    return {n for n, c in counts.items() if c > 1}


def test_split_reads_merge_into_spanning_fragments(supp_sim):
    cfg, _truth, sim = supp_sim
    split = _split_read_names(sim, cfg.contig_name)
    assert len(split) > 10, "sim should emit split reads"

    from floria_tpu.ingest import bam as bamlib
    from floria_tpu.ingest.fragments import get_frags_from_bam
    from floria_tpu.ingest.vcf import read_vcf
    vcf = read_vcf(os.path.join(sim, "sim.vcf"))
    cv = vcf.contigs[cfg.contig_name]
    opts = Options(bam_file=os.path.join(sim, "sim.bam"),
                   vcf_file=os.path.join(sim, "sim.vcf"))
    main = bamlib.BamFile(os.path.join(sim, "sim.bam"))
    frags, _snpless = get_frags_from_bam(main, None, cv, opts, None,
                                         cfg.contig_name)
    by_name = {f.id: f for f in frags}
    merged_spanning = 0
    for name in split:
        if name not in by_name:
            continue  # segments may carry no SNPs
        f = by_name[name]
        # Merged fragment must span the deletion: its SNP footprint
        # covers both segments, so genomic span > one segment + gap.
        span = cv.snp_to_gn(f.last_position) - cv.snp_to_gn(f.first_position)
        if span > cfg.supp_gap:
            merged_spanning += 1
    assert merged_spanning > len(split) * 0.8


def test_supp_pipeline_purity(supp_sim, tmp_path):
    cfg, truth, sim = supp_sim
    out = tmp_path / "out"
    run(Options(bam_file=os.path.join(sim, "sim.bam"),
                vcf_file=os.path.join(sim, "sim.vcf"),
                reference_fasta=os.path.join(sim, "sim.fa"),
                out_dir=str(out), overwrite=True, snp_count_filter=5))
    hs = out / cfg.contig_name / f"{cfg.contig_name}.haplosets"
    groups, cur = {}, None
    for line in open(hs):
        if line.startswith(">"):
            cur = line.split()[0][1:]
            groups[cur] = []
        else:
            groups[cur].append(line.split()[0])
    seen = [r for g in groups.values() for r in g]
    assert len(seen) == len(set(seen)), "a read appears in two haplosets"
    split = _split_read_names(sim, cfg.contig_name)
    assert split & set(seen), "no split read was phased"
    # Purity: majority-strain fraction per haploset, weighted.
    good = total = 0
    for members in groups.values():
        ks = [truth.read_strains[m] for m in members
              if m in truth.read_strains]
        if not ks:
            continue
        good += np.bincount(ks).max()
        total += len(ks)
    print(f"supp haploset purity: {good / total:.4f} over {total} reads")
    # Measured 1.0000 over 200 reads (floor = measured - 5%).
    assert total > 0 and good / total >= 0.95


def test_supp_disabled_still_runs(supp_sim, tmp_path):
    cfg, _truth, sim = supp_sim
    out = tmp_path / "out"
    run(Options(bam_file=os.path.join(sim, "sim.bam"),
                vcf_file=os.path.join(sim, "sim.vcf"),
                reference_fasta=os.path.join(sim, "sim.fa"),
                out_dir=str(out), overwrite=True, snp_count_filter=5,
                dont_use_supp_aln=True))
    assert os.path.exists(
        out / cfg.contig_name / f"{cfg.contig_name}.vartigs")
