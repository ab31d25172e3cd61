"""Trace a train step and bucket device time by HLO op class.

Runs N steps of a preset under jax.profiler.trace, parses the perfetto
`vm.trace.json.gz` the axon backend emits, and prints per-op device time
(averaged over steps) grouped into buckets.  Usage:

    python tools/step_trace.py base exact   # exact batch-stats BN
    python tools/step_trace.py base fast    # frozen-BN fast mode
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

STEPS = 5


def run(preset: str, mode: str, outdir: str):
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    from vit_unet_tpu.parallel.train_step import (TrainState,
                                                  build_step_functions)
    from vit_unet_tpu.train.losses import mse

    model = get_vit_unet(preset, dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=True, flash_train=True,
                         flash_frozen_bn=(mode == "fast"))
    tx = optax.adamw(1e-4)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 224, 224)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse)
    x = jax.random.normal(jax.random.key(2), (64, 3, 224, 224), jnp.float32)
    data = {"x": x, "y": x * 0.9}
    for _ in range(3):
        state, m = steps.train_step(state, data)
        float(m["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(STEPS):
            state, m = steps.train_step(state, data)
            float(m["loss"])


def bucket(name: str) -> str:
    n = name.lower()
    if ("custom-call" in n or "pallas" in n or "tpu_custom_call" in n
            or "_attend_flash" in n or "flash_reattention" in n):
        # the profiler names custom-calls after their source op (e.g.
        # ReAttn._attend_flash_train.29), not the HLO opcode
        return "flash kernels"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "formatting"
    if "dot" in n or "conv" in n:
        return "matmul/conv"
    if "reduce" in n:
        return "reduce"
    if "pad" in n or "slice" in n or "concat" in n:
        return "pad/slice"
    return "other"


def parse(outdir: str):
    paths = glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pick pids whose name mentions TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():   # XLA Ops lane only, not step lane
            continue
        dur = e.get("dur", 0) / 1e3 / STEPS   # us -> ms, per step
        name = e.get("name", "?")
        if name.startswith("jit_"):   # whole-module event, not an op
            continue
        args = e.get("args") or {}
        long = args.get("long_name") or args.get("tf_op") or ""
        per_op[(name, long[:90])] += dur
        per_bucket[bucket(name)] += dur
        total += dur
    print(f"\n== {path}")
    print(f"device total: {total:.1f} ms/step")
    for b, v in per_bucket.most_common():
        print(f"  {b:<16} {v:8.2f} ms")
    print("top ops:")
    for (name, long), v in per_op.most_common(28):
        print(f"  {v:7.2f} ms  {name}  | {long}")


if __name__ == "__main__":
    preset, mode = sys.argv[1], sys.argv[2]
    outdir = f"/tmp/trace_{preset}_{mode}"
    if len(sys.argv) < 4 or sys.argv[3] != "parse-only":
        run(preset, mode, outdir)
    parse(outdir)
