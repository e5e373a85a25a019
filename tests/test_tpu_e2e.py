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
