"""Flash-vs-XLA parity drift along a real exact-BN training trajectory.

tools/bn_probe_jax.py found the overfit-32 exact-BN probe trains to
16.6 dB on the XLA path but plateaus at ~6 dB on the flash train kernels —
same config, same f32 dtype, same seeds.  Kernel parity tests pass at
random-init activation scale; this tool measures whether parity *degrades
along the trajectory* (a precision-regime problem as activations grow
through the loss-32 → loss-0.02 descent) or stays tight (pointing at
optimisation dynamics instead).

Protocol: train with --train-path (default xla).  Every K steps, at the
SAME state and batch, compute loss + full parameter gradient through BOTH
paths and record: per-path loss, relative loss gap, global gradient
cosine, relative L2 error, and the worst single-leaf relative error.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bn_probe_drift.py
      [--train-path xla|flash] [--steps 200] [--every 20]
Appends JSON rows to tools/bn_probe_drift.jsonl.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bn_oracle_probe import BATCH, N, STEPS, make_pairs  # noqa: E402

from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig  # noqa: E402
from vit_unet_tpu.parallel.train_step import (TrainState,  # noqa: E402
                                              build_step_functions)
from vit_unet_tpu.train.losses import mse  # noqa: E402

IM = 96


def make_models():
    cfg = ViTUNetConfig(
        depth=2, depth_te=1, size_bottleneck=2, preprocessing="conv",
        im_size=IM, patch_size=16, num_channels=3, hidden_dim=64,
        num_heads=4, attn_drop=0.0, proj_drop=0.0, linear_drop=0.0)
    xla = ViTUNet(cfg)
    flash = ViTUNet(dataclasses.replace(cfg, use_flash=True,
                                        flash_train=True))
    return xla, flash


def grad_fn(model):
    def f(params, batch_stats, rng, x, y):
        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return mse(out, y)
        return jax.value_and_grad(loss)(params)
    return jax.jit(f)


def compare(gx, gf):
    """(cosine, rel_l2, worst_leaf_rel, worst_leaf_name)."""
    fx = [np.asarray(a, np.float64).ravel() for a in jax.tree.leaves(gx)]
    ff = [np.asarray(a, np.float64).ravel() for a in jax.tree.leaves(gf)]
    vx, vf = np.concatenate(fx), np.concatenate(ff)
    cos = float(vx @ vf / max(np.linalg.norm(vx) * np.linalg.norm(vf),
                              1e-30))
    rel = float(np.linalg.norm(vx - vf) / max(np.linalg.norm(vx), 1e-30))
    worst, worst_name = 0.0, ""
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gx),
                            jax.tree.leaves(gf)):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        d = float(np.linalg.norm(a64 - b64) /
                  max(np.linalg.norm(a64), 1e-30))
        if d > worst:
            worst, worst_name = d, jax.tree_util.keystr(path)
    return cos, rel, worst, worst_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-path", default="xla", choices=("xla", "flash"))
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--save-at", type=int, default=None,
                    help="pickle {params,batch_stats,x,y} at this step to "
                         "tools/bn_drift_state.pkl for offline (CPU "
                         "interpret-mode) gradient comparison")
    args = ap.parse_args()

    xla_model, flash_model = make_models()
    xt, yt = make_pairs(N, 0)
    x = jnp.asarray(xt.numpy())
    y = jnp.asarray(yt.numpy())
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    variables = jax.jit(xla_model.init)(jax.random.key(0), x[:1])
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    train_model = xla_model if args.train_path == "xla" else flash_model
    steps = build_step_functions(train_model, tx, mse, donate=False)
    g_xla, g_flash = grad_fn(xla_model), grad_fn(flash_model)

    rows = []
    g = np.random.default_rng(1)
    t0 = time.time()
    for step in range(args.steps):
        idx = g.permutation(N)[:BATCH]
        xb, yb = x[idx], y[idx]
        if args.save_at is not None and step == args.save_at:
            import pickle
            payload = jax.device_get({"params": state.params,
                                      "batch_stats": state.batch_stats,
                                      "x": xb, "y": yb, "step": step})
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bn_drift_state.pkl")
            with open(out, "wb") as f:
                pickle.dump(payload, f)
            print(f"saved state at step {step} -> {out}", flush=True)
        if step % args.every == 0:
            probe_rng = jax.random.key(9000 + step)
            lx, gx = g_xla(state.params, state.batch_stats, probe_rng,
                           xb, yb)
            lf, gf = g_flash(state.params, state.batch_stats, probe_rng,
                             xb, yb)
            cos, rel, worst, worst_name = compare(gx, gf)
            row = {"train_path": args.train_path, "step": step,
                   "loss_xla": round(float(lx), 6),
                   "loss_flash": round(float(lf), 6),
                   "loss_rel_gap": round(abs(float(lx) - float(lf))
                                         / max(abs(float(lx)), 1e-30), 6),
                   "grad_cos": round(cos, 6), "grad_rel_l2": round(rel, 6),
                   "worst_leaf_rel": round(worst, 6),
                   "worst_leaf": worst_name}
            rows.append(row)
            print(json.dumps(row), flush=True)
        state, m = steps.train_step(state, {"x": xb, "y": yb})
    print(f"done in {time.time()-t0:.0f}s, final train loss "
          f"{float(m['loss']):.5f}", flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bn_probe_drift.jsonl"), "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
