"""Test config: force an 8-device virtual CPU mesh (SURVEY.md §4 — JAX's CPU
backend is the 'fake device' for sharding tests; bench runs on real TPU)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon remote-TPU plugin registers itself from sitecustomize at
# interpreter start — BEFORE this file runs — so env mutation here is too
# late to stop the registration (and its tunnel is single-client: a test
# run on it would steal the chip from a concurrent benchmark). Backend
# *initialization* is lazy though, so forcing the platform through
# jax.config before any device is touched reliably lands the suite on the
# 8-device virtual CPU mesh. Launching with the env prefix
# `PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu` additionally skips the
# plugin's 40-180 s tunnel handshake stall.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from vvr_tpu.config import WorldConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_world():
    """64^3 world (depth 3) — fast to build, shared across tests."""
    from vvr_tpu.world.generator import generate_world, assemble_dense
    cfg = WorldConfig(depth=3)
    chunks = generate_world(cfg)
    occ = assemble_dense(chunks, cfg.size)
    return cfg, chunks, occ


@pytest.fixture(scope="session")
def medium_world():
    """256^3 world (depth 4) — the benchmark scene shape."""
    from vvr_tpu.world.generator import generate_world, assemble_dense
    cfg = WorldConfig(depth=4)
    chunks = generate_world(cfg)
    occ = assemble_dense(chunks, cfg.size)
    return cfg, chunks, occ


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(421)  # reference's light seed (renderer.rs:494)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: heavy tests (large corpora / frame-level equality, minutes "
        "each on CPU) — excluded from the smoke tier")
    config.addinivalue_line(
        "markers",
        "smoke: fast tier — every kernel's oracle contract at reduced "
        "corpus; `pytest -m smoke` runs in minutes, the full suite in ~1 h")


def pytest_collection_modifyitems(config, items):
    """Every test not explicitly marked `full` belongs to the smoke tier,
    so `pytest -m smoke` / `pytest -m full` partition the suite exactly."""
    for item in items:
        if "full" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
