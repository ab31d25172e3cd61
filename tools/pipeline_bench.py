"""Dispatch-pipelining experiment: how much of the wall-vs-device gap is
host/tunnel sync that a bounded-depth dispatch queue recovers?

Round-3 traces put base's device step at 127.4 ms (fast) / 151.2 ms (exact)
while the per-step-synced wall numbers are ~157 / ~179 ms — a ~28 ms/step
host tax.  bench.py syncs every step (scalar D2H on the loss) because deep
unsynced queues degrade pathologically under the tunnel (donated buffers
pile up).  A *depth-2* queue — sync step i-1 before dispatching i+1 —
keeps at most two states live while overlapping dispatch with device work.

Usage: python tools/pipeline_bench.py [preset] [batch ...]
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax


def build(name: str, batch: int, frozen_bn: bool):
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
    from vit_unet_tpu.train.losses import mse

    model = get_vit_unet(name, dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=True, flash_train=True,
                         flash_frozen_bn=frozen_bn)
    tx = optax.adamw(1e-4)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 224, 224)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse)
    x = jax.random.normal(jax.random.key(2), (batch, 3, 224, 224),
                          jnp.float32)
    return state, steps, {"x": x, "y": x * 0.9}


def timed_sync_every(state, steps, data, iters=10):
    """Current bench methodology: scalar D2H barrier per step."""
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = steps.train_step(state, data)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], state


def timed_depth(state, steps, data, depth=2, iters=10):
    """Bounded-depth pipeline (the Fitter's dispatch model): keep at most
    ``depth`` unsynced steps in flight, syncing the oldest pending loss
    before dispatching past the bound.  Throughput over the whole window
    (per-step timing is ill-defined when dispatch overlaps device work)."""
    from collections import deque
    pending = deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = steps.train_step(state, data)
        pending.append(m["loss"])
        if len(pending) >= depth:
            float(pending.popleft())
    while pending:
        float(pending.popleft())
    dt = (time.perf_counter() - t0) / iters
    return dt, state


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "base"
    batches = [int(b) for b in sys.argv[2:]] or [64]
    for frozen in (True, False):
        mode = "fast" if frozen else "exact"
        for batch in batches:
            state, steps, data = build(preset, batch, frozen)
            # warmup/compile
            for _ in range(3):
                state, m = steps.train_step(state, data)
                float(m["loss"])
            dt_s, state = timed_sync_every(state, steps, data)
            row = (f"{preset} {mode} b{batch}: sync-every {dt_s*1e3:7.1f} ms "
                   f"({batch/dt_s:6.1f} img/s)")
            for depth in (2, 4, 8):
                dt_p, state = timed_depth(state, steps, data, depth=depth)
                row += (f" | depth-{depth} {dt_p*1e3:7.1f} ms "
                        f"({batch/dt_p:6.1f} img/s)")
            print(row, flush=True)


if __name__ == "__main__":
    main()
