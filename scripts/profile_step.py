"""Decompose the beam step cost: scan stripped variants of the
main-phase step to find what dominates the ~0.5 ms/step.

Usage: python scripts/profile_step.py [--cpu]
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


def build_case(G, R, S, B, P):
    import jax.numpy as jnp

    alleles, weights, _nr, _eps = make_workload(G, R, S)
    A = 2
    oh = (alleles[:, :, None, :] == np.arange(A, dtype=np.int8)[
        None, None, :, None]).astype(np.float32)
    wa = oh * weights[:, :, None, :]
    cov = (alleles >= 0)
    hist = np.zeros((G, B, P, R), dtype=np.float32)
    rng = np.random.default_rng(0)
    for g in range(G):
        for r in range(R // 2):
            hist[g, :, rng.integers(0, P), r] = 1.0
    return (jnp.asarray(hist), jnp.asarray(wa),
            jnp.asarray(weights), jnp.asarray(oh),
            jnp.asarray(cov))


def timed(name, fn, *args, iters=3):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
        jax.block_until_ready(out)
    per = (time.time() - t0) / iters
    R = 256
    print(f"{name:28s} {per*1e3:9.2f} ms/scan  {per/R*1e6:8.1f} us/step",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    G, R, S, B, P = 32, 256, 256, 10, 5
    A = 2
    hist, wa, weights, oh, cov = build_case(G, R, S, B, P)
    ts = jnp.arange(R, dtype=jnp.int32)

    def scan_of(step):
        def run(hist, wa, weights, oh, cov):
            def body(h, t):
                return step(h, t, wa, weights, oh, cov), ()
            h, _ = jax.lax.scan(body, hist, ts, unroll=4)
            return h
        return jax.vmap(run)

    # v0: reconstruction einsum only
    def step_recon(h, t, wa, weights, oh, cov):
        win = jnp.einsum("bpr,ras->bpas", h, wa,
                         preferred_element_type=jnp.float32)
        return h + win.sum() * 1e-30

    # v1: + distance reductions
    def step_dist(h, t, wa, weights, oh, cov):
        win = jnp.einsum("bpr,ras->bpas", h, wa,
                         preferred_element_type=jnp.float32)
        maxc = win.max(axis=2)
        at = (win * oh[t][None, None]).sum(axis=2)
        w = weights[t][None, None]
        c = cov[t][None, None]
        same = (w * (c & (at == maxc))).sum(-1)
        diff = (w * (c & (at < maxc))).sum(-1)
        return h + (same.sum() + diff.sum()) * 1e-30 + win.sum() * 1e-30

    # v2: + top_k + one-hot gather + update
    def step_full(h, t, wa, weights, oh, cov):
        win = jnp.einsum("bpr,ras->bpas", h, wa,
                         preferred_element_type=jnp.float32)
        maxc = win.max(axis=2)
        at = (win * oh[t][None, None]).sum(axis=2)
        w = weights[t][None, None]
        c = cov[t][None, None]
        same = (w * (c & (at == maxc))).sum(-1)
        diff = (w * (c & (at < maxc))).sum(-1)
        cand = diff + same * 1e-3
        neg, idx = jax.lax.top_k(-cand.reshape(B * P), B)
        parent = idx // P
        part = idx % P
        g_oh = jax.nn.one_hot(parent, B, dtype=jnp.float32)
        nh = jnp.einsum("bB,BPR->bPR", g_oh, h,
                        preferred_element_type=jnp.float32)
        p_oh = jax.nn.one_hot(part, P, dtype=jnp.float32)
        t_oh = (jnp.arange(R) == t).astype(jnp.float32)
        return nh + p_oh[:, :, None] * t_oh[None, None, :]

    # v3: no reconstruction — distances from a fake small tensor
    def step_notrecon(h, t, wa, weights, oh, cov):
        at = jnp.einsum("bpr,r->bp", h, wa[:, 0, 0],
                        preferred_element_type=jnp.float32)
        cand = at
        neg, idx = jax.lax.top_k(-cand.reshape(B * P), B)
        parent = idx // P
        part = idx % P
        g_oh = jax.nn.one_hot(parent, B, dtype=jnp.float32)
        nh = jnp.einsum("bB,BPR->bPR", g_oh, h,
                        preferred_element_type=jnp.float32)
        p_oh = jax.nn.one_hot(part, P, dtype=jnp.float32)
        t_oh = (jnp.arange(R) == t).astype(jnp.float32)
        return nh + p_oh[:, :, None] * t_oh[None, None, :]

    # v4: top_k only on precomputed cand
    def step_topk(h, t, wa, weights, oh, cov):
        cand = h[:, :, 0]
        neg, idx = jax.lax.top_k(-cand.reshape(B * P), B)
        return h + neg.sum() * 1e-30 + idx.sum().astype(jnp.float32) * 1e-30

    for name, step in (("recon-only", step_recon),
                       ("recon+dist", step_dist),
                       ("full", step_full),
                       ("no-recon", step_notrecon),
                       ("topk-only", step_topk)):
        timed(name, scan_of(step), hist, wa, weights, oh, cov)


if __name__ == "__main__":
    main()
