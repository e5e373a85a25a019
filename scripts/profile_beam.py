"""Profile the beam kernel's per-step cost vs batch size and window.

Usage: python scripts/profile_beam.py [--cpu]

Measures ms/scan-step for the mixed-ploidy beam dispatch across G
(batch), S (sites), and window settings to locate the fixed overhead
reported in round 1 (~0.5 ms/step regardless of G or S).
"""

import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import make_workload  # noqa: E402


def run_case(G, R, S, window, iters=3, impl="hist", dedup=True):
    import jax

    from floria_tpu.kernels.beam import beam_search_batch_mixed

    alleles, weights, num_reads, eps = make_workload(G, R, S)
    nparts = np.full(G, 5, dtype=np.int32)
    # Mirror phase_instances: mixed dispatch covering the 2..5 sweep.
    nparts[: G // 4] = 2
    nparts[G // 4: G // 2] = 3
    nparts[G // 2: 3 * G // 4] = 4

    dev = [jax.device_put(a) for a in (alleles, weights, num_reads,
                                       eps, nparts)]

    def sweep():
        out = beam_search_batch_mixed(*dev, 5, 10, window=window,
                                      impl=impl, dedup=dedup)
        out[0].block_until_ready()

    t0 = time.time()
    sweep()
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        sweep()
    per = (time.time() - t0) / iters
    ms_step = per / R * 1e3
    rps = G * R / per
    print(f"{impl:6s} dedup={int(dedup)} G={G:4d} R={R} S={S} "
          f"win={window:4d} | compile {compile_s:6.1f}s"
          f" | {per*1e3:8.1f} ms/sweep | {ms_step:7.3f} ms/step |"
          f" {rps:9.0f} reads/s", flush=True)
    return per


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    R = 256
    for G in (32, 128):
        run_case(G, R, 256, 0, impl="hist")
    run_case(32, R, 256, 0, impl="hist", dedup=False)
    run_case(32, R, 256, 0, impl="counts")
    for S in (512, 1024):
        run_case(32, R, S, 0, impl="hist")
        run_case(32, R, S, 512, impl="hist")


if __name__ == "__main__":
    main()
