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


def test_hamming_precheck_matches_exact_nw():
    """floria_realign_exact's hamming<=2 rule must agree with the full
    NW argmax wherever it claims a resolution — including adversarial
    periodic/repeat windows where gapped (shifted) alignments score
    highest, and h=2 vs h=3 boundary cases."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    T, A = 120, 4
    ref_tab = np.empty((T, R.WINDOW), np.uint8)
    for t in range(T):
        if t % 3 == 0:  # periodic repeat: shifts align almost perfectly
            period = int(rng.integers(1, 5))
            motif = rng.integers(1, 16, period)
            ref_tab[t] = np.tile(motif, R.WINDOW // period + 1)[:R.WINDOW]
        else:
            ref_tab[t] = rng.integers(0, 16, R.WINDOW)
    al_tab = rng.integers(1, 16, (T, A)).astype(np.uint8)
    nal_tab = rng.integers(1, A + 1, T).astype(np.int32)
    n = 6000
    si = rng.integers(0, T, n).astype(np.int32)
    nal = nal_tab[si]
    q = np.empty((n, R.WINDOW), np.uint8)
    for i in range(n):
        w = ref_tab[si[i]].copy()
        w[R.FLANK] = al_tab[si[i], rng.integers(0, nal[i])]
        kind = i % 5
        if kind == 1:  # 1-3 mismatches (h boundary cases)
            k = int(rng.integers(1, 4))
            pos = rng.choice(R.WINDOW, k, replace=False)
            w[pos] = (w[pos] + rng.integers(1, 15, k)) % 16
        elif kind == 2:  # shift: gapped alignment beats gapless
            s = int(rng.integers(1, 4))
            w = np.concatenate(
                [w[s:], rng.integers(0, 16, s).astype(np.uint8)])
        elif kind == 3:  # shift of the repeat + a mismatch
            s = int(rng.integers(1, 3))
            w = np.concatenate(
                [rng.integers(0, 16, s).astype(np.uint8), w[:-s]])
            w[rng.integers(0, R.WINDOW)] = rng.integers(0, 16)
        elif kind == 4:
            w = rng.integers(0, 16, R.WINDOW).astype(np.uint8)
        q[i] = w
    qp = np.ascontiguousarray(
        (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8))
    var = np.repeat(ref_tab[:, None, :], A, axis=1)
    var[:, :, R.FLANK] = al_tab
    var_packed = np.ascontiguousarray(
        (var[:, :, 0::2] | (var[:, :, 1::2] << 4)).astype(np.uint8))
    pre = native.realign_exact(qp, si, nal, var_packed)
    exact = native.nw_batch(qp, si, nal, ref_tab, al_tab)
    resolved = pre >= 0
    assert resolved.sum() > n // 3  # the rule must actually fire
    assert (~resolved).sum() > 0    # and leave hard cases to the NW
    assert np.array_equal(pre[resolved], exact[resolved])
