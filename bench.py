"""Benchmark: device beam-search phasing throughput (reads/s/chip).

Measures the framework's dominant kernel — the batched beam-search ploidy
sweep (SURVEY.md §3.2: beam scoring dominates the reference's runtime) —
on a synthetic 3-strain workload shaped like real long-read blocks
(R reads x S SNPs, ploidy sweep 2..5, beam width 10), batched G blocks per
dispatch as the pipeline does.

Metric: unique (read, block) insertions per second, with the full ploidy
sweep included in the cost — directly comparable to the reference, whose
per-block loop also runs the sweep (graph_processing.rs:132-252).

vs_baseline: the reference publishes no numbers (BASELINE.md), and no Rust
toolchain exists in this image, so the baseline is a first-principles
estimate of single-core Rust floria: ~30-60us per (read, beam, part)
hashmap-walk insert, beam 10, warmup 25 reads at ploidy*10 beams, summed
over the 2..5 sweep => ~0.5ms per read full sweep => ~2000 reads/s
single-core. The >=10x north-star target therefore sits at 20_000.
"""

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 2000.0


def make_workload(G, R, S, num_strains=3, epsilon=0.02, seed=0):
    rng = np.random.default_rng(seed)
    strains = rng.integers(0, 2, (G, num_strains, S))
    origin = rng.integers(0, num_strains, (G, R))
    span = S // 2
    starts = rng.integers(0, S - span, (G, R))
    alleles = np.full((G, R, S), -1, dtype=np.int8)
    weights = np.zeros((G, R, S), dtype=np.float32)
    for g in range(G):
        for r in range(R):
            s0 = starts[g, r]
            hap = strains[g, origin[g, r], s0:s0 + span].copy()
            err = rng.random(span) < epsilon
            hap[err] = 1 - hap[err]
            alleles[g, r, s0:s0 + span] = hap
            weights[g, r, s0:s0 + span] = 1.0 - 10.0 ** (
                rng.integers(10, 40, span) / -10.0)
    order = np.argsort(starts, axis=1, kind="stable")
    alleles = np.take_along_axis(alleles, order[:, :, None], axis=1)
    weights = np.take_along_axis(weights, order[:, :, None], axis=1)
    num_reads = np.full(G, R, dtype=np.int32)
    eps = np.full(G, epsilon, dtype=np.float32)
    return alleles, weights, num_reads, eps


def main():
    quick = "--quick" in sys.argv
    import jax

    from floria_tpu.kernels.beam import beam_search_batch

    G, R, S = (8, 64, 128) if quick else (32, 256, 256)
    ploidies = (2, 3, 4, 5)
    iters = 2 if quick else 3
    args = make_workload(G, R, S)

    def sweep():
        outs = []
        for p in ploidies:
            outs.append(beam_search_batch(*args, ploidy=p, beam_width=10))
        for o in outs:
            o[0].block_until_ready()

    sweep()  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        sweep()
    elapsed = time.time() - t0

    reads_per_sec = G * R * iters / elapsed
    print(json.dumps({
        "metric": "reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s (full 2..5 ploidy sweep, beam 10)",
        "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
