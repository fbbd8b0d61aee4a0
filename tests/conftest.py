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


def _ensure_native_extension() -> None:
    """Build the C extension in place if it is missing (fresh checkout:
    the .so is gitignored).  Best-effort — tests that REQUIRE the
    extension still assert HAVE_NATIVE, so a broken toolchain fails
    loudly there rather than silently testing only the fallback."""
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    try:
        from cfrk_tpu.io.native import HAVE_NATIVE

        if HAVE_NATIVE:
            return
    except ImportError:
        return
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=root, capture_output=True, timeout=300, check=False,
        )
    except (OSError, subprocess.TimeoutExpired):
        return
    # Re-import with the freshly built .so.  A plain reload is NOT
    # enough: the failed first import left `_fastaio = None` as a
    # package attribute, and `from . import _fastaio` resolves that
    # stale attribute instead of importing the new extension.  Drop the
    # cached modules (every consumer imports the package lazily, so the
    # fresh module object takes effect everywhere) and invalidate the
    # FileFinder caches that would otherwise hide the just-written .so.
    import importlib
    import sys as _sys

    for name in ("cfrk_tpu.io.native._fastaio", "cfrk_tpu.io.native"):
        _sys.modules.pop(name, None)
    importlib.invalidate_caches()
    importlib.import_module("cfrk_tpu.io.native")


_ensure_native_extension()


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
