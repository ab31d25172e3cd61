"""Driver-gate regression tests (VERDICT.md round 1, Missing #1).

Round 1 shipped a red multi-chip gate because ``dryrun_multichip`` was only
ever exercised under ``JAX_PLATFORMS=cpu`` isolation, while the driver runs
it with the TPU PJRT plugin registered (where ``jax.devices()`` returns the
single real chip regardless of ``--xla_force_host_platform_device_count``).
These tests invoke the gates the way the driver does: a fresh subprocess,
no platform pinning, only the XLA host-device-count flag.
"""
import os
import subprocess
import sys

import jax


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(n: int = 8) -> dict:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_driver_env():
    """The exact driver invocation: TPU plugin registered, 8 virtual CPU
    devices, no JAX_PLATFORMS."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip;"
         "dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=REPO, env=_driver_env(8), capture_output=True, text=True,
        timeout=560)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_multichip_poisoned_default_backend():
    """VERDICT r2 Missing #1: the driver env can have a TPU plugin whose
    *dispatch* is broken (libtpu client/terminal mismatch) — the plugin
    registers, ``jax.devices()`` may even list the chip, but the first eager
    op dies.  ``dryrun_multichip`` must therefore (a) pin the default device
    to CPU before any array op and (b) never consult the default backend at
    all when CPU has enough virtual devices.  This test poisons default-
    backend discovery so any such consultation raises, and asserts the dry
    run still completes green.
    """
    script = """
import jax

_real_devices = jax.devices

def _poisoned(backend=None):
    if backend is None or str(backend) not in ("cpu",):
        raise RuntimeError("poisoned default backend "
                           "(simulated libtpu client/terminal mismatch)")
    return _real_devices(backend)

jax.devices = _poisoned

from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)

d = jax.config.jax_default_device
assert d is not None and d.platform == "cpu", d
print("POISONED_DRYRUN_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=_driver_env(8), capture_output=True, text=True,
        timeout=560)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "POISONED_DRYRUN_OK" in proc.stdout


def test_entry_returns_jittable():
    """entry() must return (fn, example_args) that trace/compile-check."""
    from __graft_entry__ import entry

    fn, example_args = entry()
    out = jax.eval_shape(fn, *example_args)
    x = example_args[-1]
    assert out.shape == x.shape and out.dtype == x.dtype


def test_bench_emits_null_artifact_on_wedged_backend():
    """bench.py is the round's other driver artifact: if the tunnelled TPU
    plugin hangs at client init (the observed wedge mode), the bench must
    emit a null JSON line and exit 0 rather than hang the driver's bench
    step forever with no artifact."""
    import json

    script = """
import time
import jax
from jax._src import xla_bridge as xb

def _hang_factory(*args, **kwargs):
    time.sleep(3600)

xb.register_backend_factory("hangtpu", _hang_factory, priority=500)
jax.config.update("jax_platforms", "hangtpu")

import bench
bench._devices_bounded(timeout_s=3.0)
print("UNREACHABLE")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=_driver_env(8), capture_output=True, text=True,
        timeout=120)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "UNREACHABLE" not in proc.stdout
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["value"] is None and "error" in line, line


def test_dryrun_multichip_wedged_default_backend():
    """Round-3 hardening: a tunnelled TPU plugin can HANG at client *init*
    (observed live: axon relay wedge, 2026-08-17) rather than error — and
    ``jax.devices("cpu")`` initialises every registered platform, so even the
    CPU query blocks.  ``dryrun_multichip`` must restrict platform discovery
    to CPU before its first backend init.  This test registers a
    highest-priority backend whose factory sleeps forever (mimicking
    ``axon.register``'s ``jax_platforms="axon,cpu"`` selection); if the gate
    ever consults it, the subprocess exceeds its timeout and the test fails.
    """
    script = """
import time
import jax
from jax._src import xla_bridge as xb

def _hang_factory(*args, **kwargs):
    time.sleep(3600)

xb.register_backend_factory("hangtpu", _hang_factory, priority=500)
jax.config.update("jax_platforms", "hangtpu,cpu")

from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)

d = jax.config.jax_default_device
assert d is not None and d.platform == "cpu", d
print("WEDGED_DRYRUN_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO, env=_driver_env(8), capture_output=True, text=True,
        timeout=560)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "WEDGED_DRYRUN_OK" in proc.stdout
