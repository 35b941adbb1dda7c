"""Test config: force an 8-device CPU mesh so sharding tests run anywhere.

The container's sitecustomize registers the axon TPU backend in every
process; tests override to CPU (fast compiles, deterministic) and request 8
virtual devices to exercise multi-chip sharding without hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, big compiles)"
    )


@pytest.fixture(autouse=True)
def _isolated_tpu_lock(tmp_path, monkeypatch):
    """Point the advisory TPU lock at a per-test path: otherwise any test
    that enters Trainer.train/eval CLIs would block on the REAL
    /tmp/phiseg_tpu.lock whenever a production trainer is running on this
    VM (tests are CPU-only and never contend for the chip)."""
    monkeypatch.setenv("PHISEG_TPU_LOCK", str(tmp_path / "tpu.lock"))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
