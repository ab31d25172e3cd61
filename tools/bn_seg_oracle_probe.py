"""Segmentation twin of tools/bn_oracle_probe.py: does EXACT batch-stats
BN collapse on the segmentation content in pure torch too?

The recorded segmentation demo (CONVERGENCE.json ``segmentation_demo``)
shows our exact-BN run collapsing (best Dice 0.23 -> 0.03) while frozen-BN
reaches 0.69, and the overfit-32 denoising probe (``bn_oracle_probe``)
shows torch's exact-BN *training fine* on that task — so the remaining
question is whether the segmentation collapse is a property of the
architecture+task (then torch collapses here as well) or of this
framework's training path (then torch trains).  This probe runs the
pure-torch oracle (real ``torch.nn.BatchNorm2d``, torch autograd,
reference semantics — tests/oracle/torch_oracle.py) on the SAME synthetic
segmentation content as the demo (examples/convergence_segmentation.py,
lite geometry at 128², dice+bce), in both BN modes.

Adaptation (the oracle is reference-parity, 3-channel output, no
out_channels knob): the logit is the channel-mean of the oracle's output —
a fixed linear head; gradients flow through the whole hierarchy exactly as
in the demo.  Results land in CONVERGENCE.json ``bn_oracle_probe``
under ``segmentation_runs``.  CPU-only; no JAX import.  ~1 h/run on one
core — run one mode per process:

  python tools/bn_seg_oracle_probe.py exact-bn
  python tools/bn_seg_oracle_probe.py frozen-bn
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.oracle.torch_oracle import ViTUNetOracle  # noqa: E402

IM, BATCH, STEPS = 128, 16, 300
N_TRAIN, N_VAL = 256, 64


def make_dataset(n: int, seed: int):
    """Same generator as examples/convergence_segmentation.py (numpy,
    bicubic upsample via torch to avoid importing JAX here)."""
    rng = np.random.default_rng(seed)
    base = torch.from_numpy(rng.normal(size=(n, 3, 8, 8)).astype(np.float32))
    imgs = torch.nn.functional.interpolate(
        base, size=(IM, IM), mode="bicubic", align_corners=False).numpy()
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
            inside = (u * u + v * v) <= 1.0
            tint = (rng.choice([-1.0, 1.0], size=3)
                    * rng.uniform(0.25, 0.5, size=3)).astype(np.float32)
            imgs[i] += tint[:, None, None] * inside[None].astype(np.float32)
            masks[i, 0][inside] = 1.0
        imgs[i] += rng.normal(scale=0.02, size=(3, IM, IM)).astype(np.float32)
    return (torch.from_numpy(np.clip(imgs, 0.0, 1.0)),
            torch.from_numpy(masks))


def dice_bce(logits, target, eps=1e-6):
    """torch edition of vit_unet_tpu.train.losses.dice_bce."""
    bce = torch.nn.functional.binary_cross_entropy_with_logits(logits, target)
    p = torch.sigmoid(logits)
    num = 2 * (p * target).sum(dim=(1, 2, 3)) + eps
    den = p.sum(dim=(1, 2, 3)) + target.sum(dim=(1, 2, 3)) + eps
    return bce + (1 - num / den).mean()


@torch.no_grad()
def val_dice(model, xv, yv, eps=1e-6):
    was_training = model.training
    model.eval()
    ds = []
    for s in range(0, len(xv), BATCH):
        logits = model(xv[s:s + BATCH]).mean(dim=1, keepdim=True)
        p = (torch.sigmoid(logits) > 0.5).float()
        t = yv[s:s + BATCH]
        num = 2 * (p * t).sum(dim=(1, 2, 3)) + eps
        den = p.sum(dim=(1, 2, 3)) + t.sum(dim=(1, 2, 3)) + eps
        ds.append((num / den).mean().item())
    if was_training:
        model.train()
    return float(np.mean(ds))


def run(tag: str, frozen_bn: bool, seed: int = 0):
    torch.manual_seed(seed)
    model = ViTUNetOracle(depth=2, depth_te=1, size_bottleneck=2,
                          preprocessing="conv", im_size=IM, patch_size=16,
                          num_channels=3, hidden_dim=64, num_heads=4,
                          attn_drop=0.0, proj_drop=0.0, linear_drop=0.0)
    model.train()
    if frozen_bn:
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.eval()
    xs, ys = make_dataset(N_TRAIN, 0)
    xv, yv = make_dataset(N_VAL, 777)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(1)
    hist = []
    t0 = time.time()
    for step in range(STEPS):
        idx = torch.randperm(N_TRAIN, generator=g)[:BATCH]
        logits = model(xs[idx]).mean(dim=1, keepdim=True)
        loss = dice_bce(logits, ys[idx])
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if (step + 1) % 50 == 0:
            d = val_dice(model, xv, yv)
            hist.append({"step": step + 1, "loss": round(loss.item(), 5),
                         "val_dice": round(d, 4)})
            print(f"[{tag}] step {step+1}: loss {loss.item():.5f} "
                  f"val Dice {d:.4f}", flush=True)
    return {"tag": tag, "steps": STEPS,
            "history": hist,
            "best_val_dice": max(h["val_dice"] for h in hist),
            "final_val_dice": hist[-1]["val_dice"],
            "wall_s": round(time.time() - t0, 1)}


def main():
    tags = sys.argv[1:] or ["exact-bn", "frozen-bn"]
    runs = [run(t, frozen_bn=(t == "frozen-bn")) for t in tags]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(path) as f:
        results = json.load(f)
    sec = results.setdefault("bn_oracle_probe", {})
    prev = {r["tag"]: r for r in sec.get("segmentation_runs", [])}
    for r in runs:
        prev[r["tag"]] = r
    sec["segmentation_runs"] = list(prev.values())
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
