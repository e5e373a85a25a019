"""The C++ Gotoh (floria_nw_batch) must equal the device NW kernel
bit-for-bit: flush_pool routes small partitions to it, so any
divergence would silently change realignment calls."""

import numpy as np
import pytest

import floria_tpu.kernels.realign as R
from floria_tpu import native


def _device_best(qp, si, ref_tab, al_tab, nal_tab, A):
    import jax.numpy as jnp

    n = len(qp)
    chunk = 32768
    Np = ((n + chunk - 1) // chunk) * chunk
    qa = np.zeros((Np, R.WINDOW // 2), np.uint8)
    qa[:n] = qp
    sa = np.zeros(Np, np.int32)
    sa[:n] = si
    out = np.asarray(R._nw_best_chunked(
        jnp.asarray(qa.reshape(-1, chunk, R.WINDOW // 2)),
        jnp.asarray(sa.reshape(-1, chunk)), jnp.asarray(ref_tab),
        jnp.asarray(al_tab), jnp.asarray(nal_tab), A))
    return out.reshape(-1)[:n]


def test_native_nw_matches_device_kernel():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    T, A = 200, 4
    ref_tab = rng.integers(0, 16, (T, R.WINDOW)).astype(np.uint8)
    al_tab = rng.integers(1, 16, (T, A)).astype(np.uint8)
    nal_tab = rng.integers(2, A + 1, T).astype(np.int32)
    n = 4000
    si = rng.integers(0, T, n).astype(np.int32)
    nal = nal_tab[si]
    # Adversarial queries: exact variants, scattered mismatches,
    # shifts (indel-like), and fully random windows.
    q = np.empty((n, R.WINDOW), np.uint8)
    for i in range(n):
        kind = i % 4
        w = ref_tab[si[i]].copy()
        if kind == 0:
            w[R.FLANK] = al_tab[si[i], rng.integers(0, nal[i])]
        elif kind == 1:
            w[rng.integers(0, R.WINDOW, rng.integers(1, 6))] = \
                rng.integers(0, 16)
        elif kind == 2:
            s = int(rng.integers(1, 4))
            w = np.concatenate(
                [w[s:], rng.integers(0, 16, s).astype(np.uint8)])
        else:
            w = rng.integers(0, 16, R.WINDOW).astype(np.uint8)
        q[i] = w
    qp = np.ascontiguousarray(
        (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8))
    host = native.nw_batch(qp, si, nal, ref_tab, al_tab)
    dev = _device_best(qp, si, ref_tab, al_tab, nal_tab, A)
    assert np.array_equal(host, dev)
