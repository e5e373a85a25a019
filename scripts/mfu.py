"""MFU / roofline accounting for the beam kernel (VERDICT r2 #3, re-
grounded round 5 on the EXACT planes kernel).

Counts FLOPs and HBM bytes per _step_planes (kernels/beam.py, the
production impl for R <= _R_CHUNK) analytically from the dispatch
shape, then measures the production mixed-ploidy sweep at several
batch sizes G and reports achieved FLOP/s, HBM bandwidth, and fraction
of v5e peak. The reference work unit being modeled is one read
insertion into every beam slot (global_clustering.rs:49-147).

Round-5 cost model (impl=planes, exact arithmetic with explicit MXU
precisions): the beam state is the persistent f32 count-plane pair
cnt [B, P, 2A, S]; each step permutes it by a one-hot HIGHEST matmul,
adds the read's row planes, and scores the read against the window —
there is NO per-step full-R weight-tensor reread any more (the hist
impl streamed [R, A, Wn] every step: 60-85% of HBM at the real shape,
the round-5 probes that motivated the planes rework). Per scan step
(B slots in, `out` slots out, ploidy P, A alleles, window Wn == S):

  FLOPs (logical; the HIGHEST permutation runs 6 bf16 passes on the
  MXU, so its hardware FLOPs are ~6x the logical count):
    permutation einsum : 2*out*B*P*2A*Wn
    row update         : 2*out*P*2A*Wn
    scoring (at/empty/cmp/mask reductions over plane pair): ~12*B*P*A*Wn
    newhist gather     : 2*out*B*P*R
    rank-select        : ~3*(B*P)^2
    dedup (2 fp)       : ~4*B*P*R
  HBM bytes (f32; upper bound — XLA fuses some rereads):
    cnt window read + permuted write : 4*Wn*2A*P*(B + out)
    scoring rereads of the window    : ~2 * 4*B*P*2A*Wn
    hist r/w                         : 2*4*B*P*R
    read row planes / masks          : ~4*(2A+2)*Wn

The kernel is no longer HBM-streaming-bound: at the real e2e shape the
measured per-step time (~0.25 ms at G=8) sits near ~100-200 GB/s of
state traffic — permutation-matmul issue and small-op latency bound.
The remaining ~3-5x headroom would need the whole scan resident in
VMEM (the Pallas design), which is blocked on Mosaic's missing f64
for the binomial-tail prune (kernels/beam_pallas.py round-5 note).

Usage:  python scripts/mfu.py            (TPU; measures G sweep)
        python scripts/mfu.py --model    (print the analytic table only)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# TPU v5e (1 chip) peaks — public spec: 197 TFLOP/s bf16, 394 TOP/s
# int8; f32 on the MXU runs at ~1/4 bf16 rate (f32 accumulate via
# passes), VPU f32 is far lower. HBM: 16 GB @ 819 GB/s.
PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 4.0
HBM_BW = 819e9


def step_flops(B, P, R, A, Wn, out):
    perm = 2.0 * out * B * P * 2 * A * Wn
    update = 2.0 * out * P * 2 * A * Wn
    score = 12.0 * B * P * A * Wn
    gather = 2.0 * out * B * P * R
    rank = 3.0 * (B * P) ** 2
    dedup = 4.0 * B * P * R
    return perm + update + score + gather + rank + dedup


def step_bytes(B, P, R, A, Wn, out):
    cnt_rw = 4.0 * Wn * 2 * A * P * (B + out)
    score_rd = 2 * 4.0 * B * P * 2 * A * Wn
    hist = 2 * 4.0 * B * P * R
    rows = 4.0 * (2 * A + 2) * Wn
    return cnt_rw + score_rd + hist + rows


def sweep_cost(R, S, ploidies, W, A=2, T1=25):
    """(FLOPs, bytes) for one block phased at every ploidy in
    `ploidies` (the bench's mixed sweep), full-S window."""
    fl = by = 0.0
    for p in ploidies:
        B1 = p * W
        warm = min(T1, R)
        fl += warm * step_flops(B1, p, R, A, S, B1)
        by += warm * step_bytes(B1, p, R, A, S, B1)
        if R > T1:
            fl += step_flops(B1, p, R, A, S, W)
            by += step_bytes(B1, p, R, A, S, W)
            fl += (R - T1 - 1) * step_flops(W, p, R, A, S, W)
            by += (R - T1 - 1) * step_bytes(W, p, R, A, S, W)
    return fl, by


def model_table(configs):
    rows = []
    for (R, S) in configs:
        fl, by = sweep_cost(R, S, (2, 3, 4, 5), 10)
        rows.append({"R": R, "S": S,
                     "sweep_gflops_per_block": round(fl / 1e9, 2),
                     "sweep_mb_per_block": round(by / 1e6, 1),
                     "arith_intensity_flop_per_byte":
                         round(fl / by, 2)})
    return rows


def measure(G_list, R, S):
    import jax

    from bench import make_workload
    from floria_tpu.kernels.beam import beam_search_batch_mixed

    ploidies = (2, 3, 4, 5)
    out = []
    for G in G_list:
        alleles, weights, num_reads, eps = make_workload(G, R, S)
        a4 = jax.device_put(np.concatenate([alleles] * len(ploidies)))
        w4 = jax.device_put(np.concatenate([weights] * len(ploidies)))
        n4 = jax.device_put(np.concatenate([num_reads] * len(ploidies)))
        e4 = jax.device_put(np.concatenate([eps] * len(ploidies)))
        nparts = jax.device_put(
            np.repeat(np.array(ploidies, np.int32), G))

        def sweep():
            r = beam_search_batch_mixed(a4, w4, n4, e4, nparts,
                                        max(ploidies), 10, max_alleles=2)
            np.asarray(r[4])

        sweep()
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            sweep()
        dt = (time.time() - t0) / iters
        fl, by = sweep_cost(R, S, ploidies, 10)
        fl *= G
        by *= G
        out.append({
            "G": G, "R": R, "S": S,
            "sweep_s": round(dt, 3),
            "reads_per_sec": round(G * R * len(ploidies) / dt, 1),
            "achieved_tflops": round(fl / dt / 1e12, 3),
            "mfu_vs_f32_peak_pct": round(100 * fl / dt / PEAK_F32, 2),
            "mfu_vs_bf16_peak_pct": round(100 * fl / dt / PEAK_BF16, 2),
            "hbm_gbps_upper_bound": round(by / dt / 1e9, 1),
            "hbm_frac_pct": round(100 * by / dt / HBM_BW, 1),
        })
        print(json.dumps(out[-1]), flush=True)
    return out


def main():
    cfgs = [(256, 256), (320, 2048)]
    print(json.dumps({"model": model_table(cfgs)}, indent=1))
    if "--model" in sys.argv:
        return
    for (R, S), gl in zip(cfgs, ([32, 64, 128], [8, 16, 32])):
        measure(gl, R, S)


if __name__ == "__main__":
    main()
