"""Single-core reference-semantics END-TO-END baseline.

Runs the independent oracle pipeline (tests/oracle_pipeline.py — the
dict/heap spec the device kernels are validated against, with the
faithful single-core C++ beam as its inner loop) through ingest ->
phasing -> writers on the bench e2e config, pinned to ONE cpu, and
prints one JSON line. This is the denominator for bench.py's
e2e_vs_baseline: the kernel ratio alone excludes ingest+join
(floria.rs:204-391 — the whole pipeline is the unit users run).

Usage: python scripts/oracle_e2e_baseline.py <cache_dir> <contig>
(spawned by `python bench.py --measure-baseline-e2e`).
"""

import json
import os
import sys
import time


def main() -> None:
    cache, contig = sys.argv[1], sys.argv[2]
    # Pin to one CPU so every stage (numpy, the C++ beam, any jax-cpu
    # fallback work) is genuinely single-core, like a 1-thread run of
    # the reference.
    try:
        os.sched_setaffinity(0, {sorted(os.sched_getaffinity(0))[0]})
    except (AttributeError, OSError):
        pass
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    from floria_tpu import threads
    from floria_tpu.options import Options

    import oracle_pipeline
    from test_pipeline_oracle import _ingest_like_pipeline

    threads.set_num_threads(1)
    opts = Options(bam_file=os.path.join(cache, "sim.bam"),
                   vcf_file=os.path.join(cache, "sim.vcf"),
                   reference_fasta=os.path.join(cache, "sim.fa"))
    out_dir = os.path.join(cache, "oracle_out")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    frags, _nosnp, cv = _ingest_like_pipeline(opts, contig)
    t_ingest = time.time() - t0
    parts, ranges, hapqs, rel, _avg = oracle_pipeline.phase_contig(
        frags, cv.genome_pos, opts)
    t_phase = time.time() - t0 - t_ingest
    oracle_pipeline.vartigs_text(parts, ranges, out_dir, contig, frags,
                                 cv.genome_pos, hapqs, rel)
    hs = oracle_pipeline.haplosets_text(parts, ranges, out_dir, contig,
                                        frags, cv.genome_pos, hapqs, rel)
    elapsed = time.time() - t0
    # Same numerator definition as bench.measure_e2e: haploset members.
    n_reads = sum(1 for line in hs.splitlines()
                  if line and not line.startswith(">"))
    print(json.dumps({
        "baseline_e2e_reads_per_sec": round(n_reads / elapsed, 1),
        "baseline_e2e_seconds": round(elapsed, 1),
        "baseline_e2e_reads": n_reads,
        "baseline_e2e_ingest_seconds": round(t_ingest, 1),
        "baseline_e2e_phase_seconds": round(t_phase, 1),
        "pinned_single_core": True,
    }))


if __name__ == "__main__":
    main()
