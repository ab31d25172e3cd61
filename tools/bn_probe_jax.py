"""Framework-side twin of tools/bn_oracle_probe.py: the SAME overfit-32
denoising probe (same clean content, same AWGN, same geometry/recipe) on
OUR ViTUNet with EXACT batch-stats BN — in both compute paths:

  xla     use_flash=False: flax BatchNorm through the XLA program
  flash   use_flash+flash_train: the fused train kernels' bn variant

Run on the real TPU.  Compared against the pure-torch oracle's curves
(CONVERGENCE.json ``bn_oracle_probe``): if torch descends and we stall,
the exact-BN pathology is OURS (a framework bug); if both descend, the
earlier segmentation-demo collapse is task-specific, not architectural.
Appends ``jax_runs`` into the same CONVERGENCE.json section.
"""
from __future__ import annotations

import json
import math
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

from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.train.losses import mse

IM = 96  # keep in sync with bn_oracle_probe.IM


def run(tag: str, use_flash: bool, seed: int = 0, bn_eps: float = 1e-5):
    model = ViTUNet(ViTUNetConfig(
        depth=2, depth_te=1, size_bottleneck=2, preprocessing="conv",
        im_size=IM, patch_size=16, num_channels=3, hidden_dim=64,
        num_heads=4, attn_drop=0.0, proj_drop=0.0, linear_drop=0.0,
        use_flash=use_flash, flash_train=use_flash, attn_bn_eps=bn_eps))
    xt, yt = make_pairs(N, 0)
    x = jnp.asarray(xt.numpy())
    y = jnp.asarray(yt.numpy())
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    variables = jax.jit(model.init)(jax.random.key(seed), x[:1])
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(seed + 1))
    steps = build_step_functions(model, tx, mse)
    g = np.random.default_rng(1)
    losses = []
    t0 = time.time()
    for step in range(STEPS):
        idx = g.permutation(N)[:BATCH]
        state, m = steps.train_step(state, {"x": x[idx], "y": y[idx]})
        losses.append(float(m["loss"]))
        if (step + 1) % 25 == 0:
            print(f"[{tag}] step {step+1}: loss {np.mean(losses[-25:]):.5f}",
                  flush=True)
    first = float(np.mean(losses[:25]))
    last = float(np.mean(losses[-25:]))
    return {"tag": tag, "steps": STEPS,
            "loss_first25": round(first, 5), "loss_last25": round(last, 5),
            "loss_drop_pct": round(100 * (1 - last / first), 1),
            "psnr_last25_db": round(-10 * math.log10(max(last, 1e-12)), 2),
            "wall_s": round(time.time() - t0, 1)}


def main():
    runs = [run("exact-bn-xla", False), run("exact-bn-flash", True)]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(path) as f:
        results = json.load(f)
    results.setdefault("bn_oracle_probe", {})["jax_runs"] = runs
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
