"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual 8-device CPU topology (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
Must run before the first `import jax` anywhere in the test session.

Set ``CFRK_TEST_TPU=1`` to SKIP the CPU override and run the suite
against whatever accelerator jax sees (slow: every shape recompiles
through the real toolchain; useful for on-chip golden validation).
"""

import os

_ON_TPU = os.environ.get("CFRK_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _ON_TPU:
    # Some environments (the axon TPU tunnel) force jax_platforms at
    # interpreter startup via sitecustomize; the config-level update
    # wins over the env var.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def make_ragged_reads(rng, n, max_len=300, p_invalid=0.02, min_len=1):
    """Random encoded reads with sprinkled invalid symbols."""
    reads = []
    for _ in range(n):
        ln = int(rng.integers(min_len, max_len + 1))
        r = rng.integers(0, 4, size=ln).astype(np.int8)
        mask = rng.random(ln) < p_invalid
        r[mask] = -1
        reads.append(r)
    return reads
