"""Exact-BN trainability cross-check on the PURE-TORCH oracle (round-4
verdict ask #2a).

CONVERGENCE.json records that exact batch-stats BN training collapses on
this framework's flash/XLA paths while frozen-BN trains (segmentation demo:
Dice 0.69 vs 0.03).  docs/PERF.md pins the pathology on the architecture —
but until now that claim rested on this framework's two paths agreeing with
each other.  This probe closes it externally: an overfit-32 run on
``tests/oracle/torch_oracle.py`` — a from-scratch vectorised torch
implementation of the reference semantics with REAL ``torch.nn.BatchNorm2d``
(the exact module the reference's torch model uses,
reference torch/model.py:136,159) — in both BN modes:

  exact-bn   model.train(): BatchNorm2d normalises by batch statistics and
             gradients flow through them (torch autograd, not our kernels).
  frozen-bn  identical, except every BatchNorm2d is held in eval() (init
             running stats, no updates) — the framework's flash_frozen_bn
             semantics.

If torch also stalls in exact mode, the pathology is a property of the
architecture, settled by an independent framework.  Writes its result into
CONVERGENCE.json under ``bn_oracle_probe``.  CPU-only; no JAX import.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.oracle.torch_oracle import ViTUNetOracle  # noqa: E402

N, IM, BATCH, STEPS = 32, 96, 8, 200
NOISE_SIGMA = 0.0955  # the SIDD recreation's calibrated 20.4 dB AWGN


def make_pairs(n: int, seed: int):
    """Same structured clean content as examples/convergence_sidd.py
    (low-frequency fields + random rectangles), torch edition."""
    rng = np.random.default_rng(seed)
    base = torch.from_numpy(rng.normal(size=(n, 3, 8, 8)).astype(np.float32))
    imgs = torch.nn.functional.interpolate(
        base, size=(IM, IM), mode="bicubic", align_corners=False).numpy()
    for i in range(n):
        for _ in range(rng.integers(2, 6)):
            y0, x0 = rng.integers(0, IM - 16, size=2)
            h, w = rng.integers(8, 48, size=2)
            imgs[i, :, y0:y0 + h, x0:x0 + w] += rng.normal(
                scale=0.5, size=(3, 1, 1)).astype(np.float32)
    lo = imgs.min(axis=(1, 2, 3), keepdims=True)
    hi = imgs.max(axis=(1, 2, 3), keepdims=True)
    clean = (imgs - lo) / np.maximum(hi - lo, 1e-6)
    noisy = clean + rng.normal(scale=NOISE_SIGMA,
                               size=clean.shape).astype(np.float32)
    return (torch.from_numpy(noisy.astype(np.float32)),
            torch.from_numpy(clean.astype(np.float32)))


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
                m.eval()  # init running stats, never updated — the
                #           framework's flash_frozen_bn semantics
    x, y = make_pairs(N, 0)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    losses = []
    t0 = time.time()
    g = torch.Generator().manual_seed(1)
    for step in range(STEPS):
        idx = torch.randperm(N, generator=g)[:BATCH]
        opt.zero_grad()
        loss = torch.mean((model(x[idx]) - y[idx]) ** 2)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        losses.append(float(loss))
        if (step + 1) % 25 == 0:
            print(f"[{tag}] step {step+1}: loss {np.mean(losses[-50:]):.5f}",
                  flush=True)
    first = float(np.mean(losses[:25]))
    last = float(np.mean(losses[-25:]))
    return {"tag": tag, "steps": STEPS,
            "loss_first25": round(first, 5), "loss_last25": round(last, 5),
            "loss_drop_pct": round(100 * (1 - last / first), 1),
            "psnr_last25_db": round(-10 * math.log10(max(last, 1e-12)), 2),
            "wall_s": round(time.time() - t0, 1)}


def main():
    runs = [run("frozen-bn", True), run("exact-bn", False)]
    section = {
        "scenario": ("overfit-32 denoising probe (128^2, the SIDD "
                     "recreation's content and 20.4 dB AWGN) on the "
                     "PURE-TORCH oracle (tests/oracle/torch_oracle.py, real "
                     "torch.nn.BatchNorm2d, torch autograd — no JAX, no "
                     "framework kernels), lite geometry, AdamW 1e-3, "
                     "grad-clip 1.0"),
        "runs": runs,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONVERGENCE.json")
    with open(path) as f:
        results = json.load(f)
    results["bn_oracle_probe"] = section
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(section, indent=1))


if __name__ == "__main__":
    main()
