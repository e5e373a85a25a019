"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-device sharding paths are
exercised without TPU hardware. Must be set before jax is imported anywhere.
"""

import os

# The interpreter may have pre-registered a TPU PJRT plugin via
# sitecustomize (which also pre-imports jax), so plain env defaults are not
# enough: force the CPU backend through jax.config before any backend
# initialization happens.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

# Repo root on the path so tests can import bench.py's workload builder.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from floria_tpu.sim.simulate import SimConfig, simulate  # noqa: E402


@pytest.fixture(scope="session")
def small_sim(tmp_path_factory):
    """A small 2-strain long-read community used across tests."""
    out = tmp_path_factory.mktemp("sim_small")
    cfg = SimConfig(contig_len=30_000, num_strains=2, num_snps=120,
                    coverage_per_strain=10.0, read_length=4_000,
                    read_length_sd=500.0, error_rate=0.01, seed=3)
    truth = simulate(cfg, str(out))
    return cfg, truth, str(out)
