"""Profile the REAL _step_hist in isolated scans: main-phase config,
warm-phase config, and ablations (no binom, no dedup, no part_active).

Usage: python scripts/profile_step2.py [--cpu]
"""

import functools
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


def main():
    import jax
    import jax.numpy as jnp

    from floria_tpu.kernels import beam as bk

    print("devices:", jax.devices(), flush=True)
    G, R, S = 32, 256, 256
    P, W = 5, 10
    A = 2
    alleles, weights, num_reads, eps_np = make_workload(G, R, S)

    def run_single(alleles, weights, num_reads, epsilon, num_parts, *,
                   B, width, dedup, use_active, window=0):
        Rl, Sl = alleles.shape
        win = Sl if window <= 0 else window
        epsf = epsilon.astype(jnp.float32)
        part_active = (jnp.arange(P) < num_parts) if use_active else None
        covered = alleles >= 0
        oh = (alleles[:, None, :] == jnp.arange(
            A, dtype=alleles.dtype)[None, :, None]).astype(jnp.float32)
        offs = bk._window_offsets(covered, Sl, win)
        starts = bk._read_starts(covered, Sl)
        wa = oh * weights[:, None, :]
        if dedup:
            vs, gs = bk._hash_consts(A, Sl, P)
            zs = [bk._suffix_hash(weights, oh, v) for v in vs]
        else:
            gs = zs = None
        hist = jnp.zeros((B, P, Rl), dtype=jnp.float32)
        score = jnp.where(jnp.arange(B) == 0, 0.0, jnp.inf).astype(
            jnp.float32)
        live = jnp.arange(B) == 0

        def step_fn(state, xs):
            hist, score, live = state
            t, off_t, st_t, a_cov, w_t, oh_t = xs
            hist, score, live, parent, part = bk._step_hist(
                hist, score, live, t, off_t, st_t, a_cov, w_t, oh_t,
                wa, zs, num_reads, epsf, width=width, ploidy=P,
                out_slots=B, window=win, gs=gs,
                part_active=part_active, dedup=dedup)
            return (hist, score, live), (parent, part)

        ts = jnp.arange(Rl, dtype=jnp.int32)
        (hist, score, live), ys = jax.lax.scan(
            step_fn, (hist, score, live),
            (ts, offs, starts, covered, weights, oh),
            unroll=bk._SCAN_UNROLL)
        return score

    def timed(name, B, width, dedup, use_active):
        fn = jax.jit(jax.vmap(functools.partial(
            run_single, B=B, width=width, dedup=dedup,
            use_active=use_active)))
        nparts = np.full(G, P, dtype=np.int32)
        args = (jnp.asarray(alleles), jnp.asarray(weights),
                jnp.asarray(num_reads), jnp.asarray(eps_np),
                jnp.asarray(nparts))
        out = fn(*args)
        out.block_until_ready()
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            out = fn(*args)
            out.block_until_ready()
        per = (time.time() - t0) / iters
        print(f"{name:34s} {per*1e3:9.2f} ms/scan  "
              f"{per/R*1e6:8.1f} us/step", flush=True)

    timed("main B=10 dedup part_act", 10, W, True, True)
    timed("main B=10 no-dedup part_act", 10, W, False, True)
    timed("main B=10 no-dedup no-act", 10, W, False, False)
    timed("warm B=50 dedup part_act", 50, 50, True, True)


if __name__ == "__main__":
    main()
