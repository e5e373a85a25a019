"""Numerically stable scoring primitives.

The beam search ranks read->haplotype assignments with a log-domain
large-deviation (relative entropy) bound on the one-sided binomial tail,
sign-flipped when the observed error rate beats epsilon, with a sample-size
shrink divisor (utils_frags.rs:205-248). log-sum-exp normalizes the
per-part scores into posteriors (utils_frags.rs:250-258).

Both numpy (host) and jax (device) variants are provided; the jax variants
are shape-polymorphic and fuse into the beam kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_A_LO = 1e-7       # clamp for k/n == 0 (utils_frags.rs:228-231)
_A_HI = 0.9999999  # clamp for k/n == 1 (utils_frags.rs:224-227)


def binom_tail_np(n, k, p: float, div_factor: float):
    """log P[Bin(n/div, p) >= k/div] large-deviation bound, elementwise.

    n, k are truncated to integers first — the reference casts its float
    same/diff sums to usize at every call site
    (global_clustering.rs:82-88). n == 0 returns 0.
    """
    n = np.floor(np.asarray(n, dtype=np.float64))
    k = np.floor(np.asarray(k, dtype=np.float64))
    safe_n = np.where(n == 0, 1.0, n)
    a = np.clip(k / safe_n, _A_LO, _A_HI)
    rel_ent = a * np.log(a / p) + (1.0 - a) * np.log((1.0 - a) / (1.0 - p))
    rel_ent = np.where(a < p, -rel_ent, rel_ent)
    out = -n / div_factor * rel_ent
    return np.where(n == 0, 0.0, out)


def binom_tail_jnp(n, k, p, div_factor):
    """Device variant of binom_tail_np (float32)."""
    n = jnp.floor(n)
    k = jnp.floor(k)
    safe_n = jnp.where(n == 0, 1.0, n)
    a = jnp.clip(k / safe_n, _A_LO, _A_HI)
    rel_ent = a * jnp.log(a / p) + (1.0 - a) * jnp.log(
        (1.0 - a) / (1.0 - p))
    rel_ent = jnp.where(a < p, -rel_ent, rel_ent)
    return jnp.where(n == 0, 0.0, -n / div_factor * rel_ent)


def log_sum_exp_np(scores, axis=-1):
    m = np.max(scores, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(scores - m), axis=axis,
                              keepdims=True))).squeeze(axis)


def log_sum_exp_jnp(scores, axis=-1):
    m = jnp.max(scores, axis=axis, keepdims=True)
    return (m + jnp.log(jnp.sum(jnp.exp(scores - m), axis=axis,
                                keepdims=True))).squeeze(axis)
