"""Beyond-identity convergence: binary shape segmentation to high Dice.

The SIDD recreation (``convergence_sidd.py``) showed the reference's
denoising task has an *identity* fixed point — the trained model's output
equals its input, exactly as the reference's own probes measured
(ViT_UNet_TF_TPU.ipynb cell 25: pred-vs-noisy 37.41 dB).  That result
proves recipe parity but cannot distinguish "the stack trains" from "the
stack copies".  This script closes that gap on the reference's *other*
README task (segmentation, README.md:95-102; run via ``--task segment``,
out_channels=1 logits head, soft-Dice+BCE): identity is worthless here
(the mask is not the image), so high Dice is only reachable by actual
representation learning through every level of the UNet hierarchy.

Synthetic task, deterministic and honest: RGB images with low-frequency
cluttered backgrounds and 1-4 tinted ellipses; the target is the union
mask.  The tint is an additive colour shift (|delta| in [0.25, 0.5],
random sign per channel) over a bg whose own dynamic range is the full
[0, 1] — per-pixel thresholding cannot recover it (the best
threshold-on-intensity Dice over the val set is reported alongside as a
floor).  Val Dice far above that floor demonstrates genuine end-to-end
representation learning (flash kernels, AdamW, on-device metrics) on the
flagship TPU model; a paired exact-batch-stats-BN run records that
configuration's training pathology (docs/PERF.md).

Appends a ``segmentation_demo`` section to CONVERGENCE.json.
"""
from __future__ import annotations

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

from vit_unet_tpu.models.vit_unet import get_vit_unet
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.train.losses import dice_bce
from vit_unet_tpu.train.metrics import dice_from_logits

IM = 128
N_TRAIN, N_VAL = 1280, 256
BATCH = 32
EPOCHS = 40


def make_dataset(n: int, seed: int):
    """(images (N, 3, IM, IM) in [0,1], masks (N, 1, IM, IM) in {0,1})."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, 3, 8, 8)).astype(np.float32)
    imgs = np.array(jax.image.resize(jnp.asarray(base), (n, 3, IM, IM),
                                     "cubic"))
    lo = imgs.min(axis=(1, 2, 3), keepdims=True)
    hi = imgs.max(axis=(1, 2, 3), keepdims=True)
    imgs = (imgs - lo) / np.maximum(hi - lo, 1e-6)
    masks = np.zeros((n, 1, IM, IM), np.float32)
    yy, xx = np.mgrid[0:IM, 0:IM].astype(np.float32)
    for i in range(n):
        for _ in range(rng.integers(1, 5)):
            cy, cx = rng.uniform(16, IM - 16, size=2)
            ry, rx = rng.uniform(8, 28, size=2)
            theta = rng.uniform(0, np.pi)
            c, s = np.cos(theta), np.sin(theta)
            u = (c * (yy - cy) + s * (xx - cx)) / ry
            v = (-s * (yy - cy) + c * (xx - cx)) / rx
            d2 = u * u + v * v
            inside = d2 <= 1.0
            tint = (rng.choice([-1.0, 1.0], size=3)
                    * rng.uniform(0.25, 0.5, size=3)).astype(np.float32)
            imgs[i] += tint[:, None, None] * inside[None].astype(np.float32)
            masks[i, 0][inside] = 1.0
        imgs[i] += rng.normal(scale=0.02, size=(3, IM, IM)).astype(np.float32)
    return np.clip(imgs, 0.0, 1.0), masks


def threshold_floor(imgs: np.ndarray, masks: np.ndarray) -> float:
    """Best achievable Dice by thresholding per-pixel mean intensity —
    the 'no learning needed' floor this task is designed to defeat."""
    inten = imgs.mean(axis=1, keepdims=True)
    best = 0.0
    for t in np.linspace(0.05, 0.95, 37):
        for sign in (1, -1):
            pred = ((inten - t) * sign > 0).astype(np.float32)
            inter = (pred * masks).sum()
            dice = 2 * inter / max(pred.sum() + masks.sum(), 1e-6)
            best = max(best, float(dice))
    return best


def run(tag: str, xs, ys, xv, yv, *, frozen_bn: bool, epochs: int = EPOCHS,
        peak_lr: float = 1e-3):
    # the reference CLI's segmentation configuration (run_denoising.py
    # --task segment): lite preset, 1-channel logits head, dice_bce
    # dropout off: at this 1280-image / ~1600-step budget the preset's 0.2
    # attention+proj dropout prevents spatial feature formation entirely
    # (probed: with dropout p(mask) == p(bg) after 15 epochs; without,
    # they separate by 0.5).  The reference never trained this task.
    model = get_vit_unet("lite", im_size=IM, out_channels=1,
                         dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=True, flash_train=True,
                         flash_frozen_bn=frozen_bn,
                         attn_drop=0.0, proj_drop=0.0)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, 50, epochs * (N_TRAIN // BATCH))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, IM, IM)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, dice_bce,
                                 metrics={"dice": dice_from_logits})

    t0 = time.time()
    hist = []
    n_steps = N_TRAIN // BATCH
    for ep in range(epochs):
        order = np.random.default_rng(ep).permutation(N_TRAIN)
        for s in range(n_steps):
            idx = order[s * BATCH:(s + 1) * BATCH]
            state, m = steps.train_step(
                state, {"x": jnp.asarray(xs[idx]), "y": jnp.asarray(ys[idx])})
        train_loss = float(m["loss"])
        ds = []
        for s in range(N_VAL // BATCH):
            sl = slice(s * BATCH, (s + 1) * BATCH)
            em = steps.eval_step(state, {"x": jnp.asarray(xv[sl]),
                                         "y": jnp.asarray(yv[sl])})
            ds.append(float(em["dice"]))
        vd = float(np.mean(ds))
        hist.append({"epoch": ep + 1, "train_loss": round(train_loss, 5),
                     "val_dice": round(vd, 4)})
        print(f"[{tag}] epoch {ep+1}: train {train_loss:.5f}, val Dice "
              f"{vd:.4f}", flush=True)
    return {"tag": tag, "epochs": epochs, "history": hist,
            "best_val_dice": max(h["val_dice"] for h in hist),
            "wall_s": round(time.time() - t0, 1)}


def run_warmup(tag: str, xs, ys, xv, yv, *, freeze_epochs: int = 20,
               epochs: int = 50, peak_lr: float = 1e-3,
               mode: str = "freeze"):
    """Warmup→batch-stats BN schedule (the ``Fitter(bn_freeze_epochs=K,
    bn_warmup=mode)`` schedule, driven directly): the first
    ``freeze_epochs`` epochs train with BN not yet on batch-stat
    normalisation, then the run flips to EXACT batch-stats semantics —
    gradients through the statistics — for the remainder.

    ``mode='freeze'``: phase 1 freezes BN at its (init) running stats
    (``build_step_functions(bn_frozen=True)``).  Recorded result: the flip
    is a normalisation SHOCK (running stats never moved off init, batch
    stats are far away) — the warmed solution is destroyed (bn-hard-flip).

    ``mode='track'``: phase 1 normalises with the running stats while
    updating them toward each batch's own moments (``bn_track=True`` —
    frozen numerics, moving stats), so at the flip batch ≈ running stats
    and the forward changes continuously.  Recorded result: the drift
    toward the near-degenerate attention-map moments makes the warmup
    itself train like exact-BN (poorly).

    ``mode='refold'`` (the shipped mitigation, ``bn_warmup='refold'``):
    phase 1 trains frozen (benign init normalisation), then at the flip
    the measured batch moments are *refolded* into each BN's affine +
    running stats (``train.bn_refold``) so the exact-semantics forward
    computes exactly the warmed function — no shock — and the optimizer
    state is re-initialised (the refolded BN scales change by orders of
    magnitude).

    All phases share one parameter tree and LR schedule, exactly like
    Fitter.
    """
    import dataclasses

    model = get_vit_unet("lite", im_size=IM, out_channels=1,
                         dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=True, flash_train=True,
                         flash_frozen_bn=False,
                         attn_drop=0.0, proj_drop=0.0)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, 50, epochs * (N_TRAIN // BATCH))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, IM, IM)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    exact_steps = build_step_functions(model, tx, dice_bce,
                                       metrics={"dice": dice_from_logits})
    if mode == "track":
        track_model = model.clone(
            config=dataclasses.replace(model.config, bn_track=True))
        frozen_steps = build_step_functions(
            track_model, tx, dice_bce, metrics={"dice": dice_from_logits})
    else:
        frozen_steps = build_step_functions(
            model, tx, dice_bce, metrics={"dice": dice_from_logits},
            bn_frozen=True)

    t0 = time.time()
    hist = []
    n_steps = N_TRAIN // BATCH
    for ep in range(epochs):
        frozen = ep < freeze_epochs
        if mode == "refold" and ep == freeze_epochs:
            # stat-matched flip: measure the head-mix BN batch moments of
            # the warmed function, fold them into the BN affines + running
            # stats, and reset the optimizer (train/bn_refold.py docstring)
            from vit_unet_tpu.train.bn_refold import (bn_refold,
                                                      estimate_bn_moments)
            calib = [jnp.asarray(xs[i * BATCH:(i + 1) * BATCH])
                     for i in range(4)]
            moments = estimate_bn_moments(
                model, {"params": state.params,
                        "batch_stats": state.batch_stats}, calib)
            p2, b2 = bn_refold(state.params, state.batch_stats, moments,
                               eps=model.config.attn_bn_eps)
            state = state.replace(params=p2, batch_stats=b2,
                                  opt_state=tx.init(p2))
            print(f"[{tag}] refold flip after epoch {ep}: {len(moments)} "
                  "BN sites refolded, optimizer reset", flush=True)
        steps = frozen_steps if frozen else exact_steps
        phase_name = mode if frozen else "exact"
        order = np.random.default_rng(ep).permutation(N_TRAIN)
        for s in range(n_steps):
            idx = order[s * BATCH:(s + 1) * BATCH]
            state, m = steps.train_step(
                state, {"x": jnp.asarray(xs[idx]), "y": jnp.asarray(ys[idx])})
        train_loss = float(m["loss"])
        ds = []
        for s in range(N_VAL // BATCH):
            sl = slice(s * BATCH, (s + 1) * BATCH)
            em = exact_steps.eval_step(
                state, {"x": jnp.asarray(xv[sl]), "y": jnp.asarray(yv[sl])})
            ds.append(float(em["dice"]))
        vd = float(np.mean(ds))
        phase = phase_name
        hist.append({"epoch": ep + 1, "phase": phase,
                     "train_loss": round(train_loss, 5),
                     "val_dice": round(vd, 4)})
        print(f"[{tag}] epoch {ep+1} ({phase}): train {train_loss:.5f}, "
              f"val Dice {vd:.4f}", flush=True)
    exact_hist = [h for h in hist if h["phase"] == "exact"]
    return {"tag": tag, "epochs": epochs, "freeze_epochs": freeze_epochs,
            "history": hist,
            "best_val_dice": max(h["val_dice"] for h in hist),
            # default=None: with freeze_epochs >= epochs there is no exact
            # phase, and a ValueError here would discard the finished run
            "best_val_dice_exact_phase": max(
                (h["val_dice"] for h in exact_hist), default=None),
            "final_val_dice": hist[-1]["val_dice"],
            "wall_s": round(time.time() - t0, 1)}


def main():
    which = set(sys.argv[1:]) or {"frozen", "exact", "warmup", "track",
                                  "refold"}
    xs, ys = make_dataset(N_TRAIN, 0)
    xv, yv = make_dataset(N_VAL, 777)
    floor = threshold_floor(xv, yv)
    print(f"threshold-on-intensity Dice floor (val): {floor:.3f}", flush=True)

    runs = []
    if "frozen" in which:
        runs.append(run("frozen-bn", xs, ys, xv, yv, frozen_bn=True))
    if "exact" in which:
        # exact batch-stats BN from scratch: documented training pathology
        # of the (never-trained-by-the-reference) torch architecture — the
        # head-mix BN normalises near-degenerate attention-map
        # distributions (var ~1e-6 at init), and batch-stat normalisation
        # feedback keeps the optimiser at the init plateau; larger eps
        # (1e-3, 1e-2) and higher LR were probed and do not rescue it.
        # The warmup run (below) is the shipped mitigation.
        runs.append(run("exact-bn", xs, ys, xv, yv, frozen_bn=False))
    if "warmup" in which:
        # the hard frozen->exact flip: recorded NEGATIVE control (the flip
        # destroys the warmed solution — stats never moved off init)
        runs.append(run_warmup("bn-hard-flip", xs, ys, xv, yv,
                               mode="freeze"))
    if "track" in which:
        runs.append(run_warmup("bn-track-warmup", xs, ys, xv, yv,
                               mode="track"))
    if "refold" in which:
        runs.append(run_warmup("bn-refold", xs, ys, xv, yv, mode="refold"))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(path) as f:
        results = json.load(f)
    section = results.get("segmentation_demo", {})
    section["scenario"] = (
        "binary shape segmentation at 128^2 on the flagship ViTUNet (lite "
        "preset, out_channels=1 logits head, dice_bce — the reference "
        "CLI's --task segment configuration), synthetic tinted-ellipse "
        "dataset where identity is worthless and per-pixel thresholding "
        "fails")
    section["threshold_floor_val_dice"] = round(floor, 4)
    # merge by tag so partial re-runs don't drop earlier runs
    by_tag = {r["tag"]: r for r in section.get("runs", [])}
    for r in runs:
        by_tag[r["tag"]] = r
    section["runs"] = list(by_tag.values())
    section["reading"] = (
        "frozen-bn Dice >> threshold floor demonstrates real end-to-end "
        "representation learning through the flash training path; exact-bn "
        "(from scratch) records the torch architecture's batch-stats-BN "
        "training pathology; bn-hard-flip is a NEGATIVE control (frozen "
        "warmup then flip: the normalisation shock destroys the solution); "
        "bn-track-warmup is a second negative control (tracking drifts the "
        "normalisation toward the degenerate moments during warmup); "
        "bn-refold is the shipped mitigation (Fitter(bn_freeze_epochs=K, "
        "bn_warmup='refold')): frozen warmup, then a stat-matched refold "
        "makes the flip function-preserving and the run ENDS in exact "
        "batch-stats semantics (train/bn_refold.py, docs/PERF.md)")
    results["segmentation_demo"] = section
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({r["tag"]: r["best_val_dice"] for r in runs}
                     | {"threshold_floor": floor}))


if __name__ == "__main__":
    main()
