"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (same XLA partitioner semantics).
Must run before the first `import jax` in any test module.
"""

import os

# NOTE: this environment preloads jax via a sitecustomize hook that
# force-registers the remote-TPU ("axon") backend and pins
# jax_platforms=axon, so the JAX_PLATFORMS env var is ignored.  Overriding
# through the config API before first backend use does work.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    # function-scoped: each test draws a reproducible sequence regardless
    # of which other tests ran before it
    return np.random.default_rng(42)


def random_seq(rng, n: int, with_n: bool = False) -> bytes:
    alphabet = b"ACGTN" if with_n else b"ACGT"
    probs = [0.245, 0.245, 0.245, 0.245, 0.02] if with_n else None
    return rng.choice(list(alphabet), size=n, p=probs).astype(np.uint8).tobytes()


@pytest.fixture
def random_seq_fn():
    return random_seq
