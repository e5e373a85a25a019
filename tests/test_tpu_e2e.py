"""Env-gated TPU smoke test (VERDICT r3 #5).

The regular suite forces the CPU backend (tests/conftest.py), so TPU-side
correctness used to rest on manual CLI A/B runs recorded in docs. With
FLORIA_TPU_E2E=1 this test runs ONE small contig end-to-end twice in
subprocesses — once on the session's real TPU backend, once on the forced
CPU backend — and byte-compares every output file. Skipped by default:
the TPU process pays real compile time (~1-10 min cold on the remote
tunnel) and the environment may not have a chip at all.

Run:  FLORIA_TPU_E2E=1 python -m pytest tests/test_tpu_e2e.py -q -s
"""

import filecmp
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(sim_dir, out_dir, env_overrides):
    env = dict(os.environ)
    # Start from a clean backend selection; the overrides pick one.
    env.pop("JAX_PLATFORMS", None)
    env.update(env_overrides)
    cmd = [sys.executable, "-m", "floria_tpu.cli",
           "-b", os.path.join(sim_dir, "sim.bam"),
           "-v", os.path.join(sim_dir, "sim.vcf"),
           "-r", os.path.join(sim_dir, "sim.fa"),
           "-o", out_dir, "--overwrite"]
    proc = subprocess.run(cmd, cwd=_REPO, env=env, capture_output=True,
                          text=True, timeout=3600)
    assert proc.returncode == 0, proc.stderr[-4000:]


@pytest.mark.skipif(os.environ.get("FLORIA_TPU_E2E") != "1",
                    reason="set FLORIA_TPU_E2E=1 to run the on-chip "
                           "smoke test (real TPU, minutes of compile)")
def test_tpu_outputs_match_cpu(small_sim, tmp_path):
    cfg, _truth, sim_dir = small_sim
    cpu_out = str(tmp_path / "cpu")
    tpu_out = str(tmp_path / "tpu")
    _run_cli(sim_dir, cpu_out,
             {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    _run_cli(sim_dir, tpu_out, {})  # the environment's real backend
    cdir = cfg.contig_name
    names = [os.path.join(cdir, f"{cfg.contig_name}.vartigs"),
             os.path.join(cdir, f"{cfg.contig_name}.haplosets"),
             os.path.join(cdir, "vartig_info.txt"),
             os.path.join(cdir, "reads_without_snps.tsv"),
             "contig_ploidy_info.tsv"]
    for name in names:
        a = os.path.join(cpu_out, name)
        b = os.path.join(tpu_out, name)
        assert os.path.exists(a), f"missing CPU output {name}"
        assert os.path.exists(b), f"missing TPU output {name}"
        if name.endswith((".vartigs", ".haplosets", "vartig_info.txt")):
            # Headers embed the output path; compare with it stripped.
            def _norm(path, root):
                with open(path) as fh:
                    return fh.read().replace(root, "OUT")
            assert _norm(a, cpu_out) == _norm(b, tpu_out), name
        else:
            assert filecmp.cmp(a, b, shallow=False), name
    print("TPU/CPU outputs byte-identical for", cfg.contig_name)


@pytest.mark.skipif(os.environ.get("FLORIA_TPU_E2E") != "1",
                    reason="set FLORIA_TPU_E2E=1 to run the on-chip "
                           "exactness probes (real TPU)")
def test_device_matmul_exactness_contract():
    """On-device pin of the round-5 precision findings: TPU's DEFAULT
    f32 dot is a single bf16 pass and silently truncates 13-bit plane
    operands (the CPU backend is always exact, so only a device test
    can catch this class of bug); Precision.HIGH restores exactness
    for the 0/1-by-13-bit window-count einsums, and the one-hot
    permutation of full 24-bit counts needs Precision.HIGHEST
    (kernels/beam.py _PLANE_MM_PRECISION / _step_planes). Runs in a
    subprocess so the suite-wide forced-CPU backend does not apply."""
    probe = r"""
import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform != "cpu", "expected an accelerator"
rng = np.random.default_rng(0)
h = (rng.random((20, 320)) < 0.5).astype(np.float32)
w = rng.integers(0, 8192, (320, 512)).astype(np.float32)
want = h.astype(np.float64) @ w.astype(np.float64)

def mm(**kw):
    return np.asarray(jax.jit(lambda a, b: jnp.einsum(
        "br,rx->bx", a, b, preferred_element_type=jnp.float32,
        **kw))(h, w)).astype(np.float64)

assert np.array_equal(mm(precision=jax.lax.Precision.HIGH), want), \
    "HIGH-precision 13-bit plane matmul must be exact on device"

B, X = 50, 1024
v = rng.integers(0, 1 << 24, (B, X)).astype(np.float32)
perm = rng.permutation(B)
oh = np.zeros((B, B), np.float32)
oh[np.arange(B), perm] = 1.0
got = np.asarray(jax.jit(lambda a, b: jnp.einsum(
    "oB,BX->oX", a, b, preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST))(oh, v))
assert np.array_equal(got, v[perm]), \
    "HIGHEST-precision one-hot 24-bit permutation must be exact"
print("DEVICE_EXACTNESS_OK")
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run([sys.executable, "-c", probe], cwd=_REPO,
                          env=env, capture_output=True, text=True,
                          timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DEVICE_EXACTNESS_OK" in proc.stdout
