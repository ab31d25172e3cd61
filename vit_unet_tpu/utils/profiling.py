"""Profiling & tracing — first-class debug subsystem (SURVEY.md §5).

The reference's only instrumentation is ad-hoc: ``torch.cuda.memory_summary``
prints after each forward stage behind a ``verbose`` flag
(``torch/model.py:381-433``) and keras per-step timing output (TF notebook
cell 23).  The TPU-native equivalents here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing an
  XPlane trace viewable in TensorBoard / xprof (device + host timelines,
  per-HLO timing; the real per-stage profiler on TPU).
* ``StageTimer`` — lightweight wall-clock stage accounting for host-side
  loops (compile vs steady-state, data stalls).
* ``device_memory_report()`` — per-device live-buffer accounting, the
  ``memory_summary`` stand-in.
* ``annotate(name)`` — ``jax.named_scope`` wrapper so model stages are
  labelled inside the compiled XLA profile (works under jit, unlike prints).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a model stage inside the XLA profile: usable as decorator or
    context manager (``with annotate('encoder_l0'): ...``)."""
    return jax.named_scope(name)


def device_memory_report(device: Optional[jax.Device] = None) -> dict:
    """Live on-device buffer accounting for one device (default: first).

    Returns {'num_buffers', 'bytes_in_use', 'by_shape': {shape: bytes}} —
    the framework's stand-in for torch.cuda.memory_summary
    (torch/model.py:381-433).  Uses live_buffers, which works on every
    backend including CPU (memory_stats() is TPU-plugin-dependent).
    """
    device = device or jax.devices()[0]
    stats = {}
    try:  # PJRT memory_stats when the plugin implements it
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    report = {
        "device": str(device),
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "num_buffers": None,
        "by_dtype": {},
    }
    try:
        # live_arrays() with no argument only reports the *default backend*'s
        # arrays; a CPU-committed array is invisible in a TPU-plugin process.
        # Query the platform the requested device actually belongs to.
        try:
            live = jax.live_arrays(device.platform)
        except Exception:
            live = jax.live_arrays()
        bufs = [b for b in live if device in b.devices()]
        report["num_buffers"] = len(bufs)
        total = 0
        for b in bufs:
            # count only the shards resident on THIS device — a sharded
            # array's global size would overcount by the shard count
            nbytes = sum(
                int(np.prod(s.data.shape)) * b.dtype.itemsize
                for s in getattr(b, "addressable_shards", [])
                if s.device == device) or (b.size * b.dtype.itemsize
                                           if len(b.devices()) == 1 else 0)
            total += nbytes
            key = str(b.dtype)
            report["by_dtype"][key] = report["by_dtype"].get(key, 0) + nbytes
        if report["bytes_in_use"] is None:
            report["bytes_in_use"] = total
    except Exception:
        pass
    return report


class StageTimer:
    """Wall-clock stage accounting for host-side loops.

    >>> t = StageTimer()
    >>> with t.stage("compile"): ...
    >>> with t.stage("step"): ...
    >>> t.summary()   # {'compile': {'total_s': ..., 'count': ..., 'mean_s': ...}}
    """

    def __init__(self):
        self._acc: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(sum(v), 4),
                "count": len(v),
                "mean_s": round(sum(v) / len(v), 4),
            }
            for name, v in self._acc.items()
        }

    def report(self) -> str:
        lines = [f"{name}: n={s['count']} total={s['total_s']}s "
                 f"mean={s['mean_s']}s"
                 for name, s in self.summary().items()]
        return "\n".join(lines)
