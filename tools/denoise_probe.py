"""Short-budget probe: which shipped configuration actually DENOISES?

Round-3 verdict: every recorded run sits at or below the identity attractor
(val PSNR == noisy baseline, CONVERGENCE.json) — as did the reference
(ViT_UNet_TF_TPU.ipynb cell 25: pred-vs-noisy 37.41 dB).  This tool runs
short (cheap) training probes of candidate configurations on the synthetic
SIDD recreation to pick the one worth a full convergence run:

  vitunet-nores   ViTUNet (flagship, torch orientation), NO global residual
                  — the model must output the denoised image itself.
  vitunet-gain    ViTUNet with global_residual + residual_gain (zero-init
                  learned per-channel gain): starts exactly at identity,
                  any learned correction is pure PSNR gain.
  tf-gain         HViTUNetTF (the reference's TPU model) + residual_gain.
  vitunet-skip[-res]        input_skip extension (direct pixel access at
                            the output conv), optionally + global residual.
  vitunet-skip-fresh        input_skip + AWGN resampled per epoch (the
                            anti-memorisation recipe; control for head2/3).
  vitunet-skip-head2/head3  input_skip + head_blocks=2 (dim 32) / 3 (dim
                            48): nonlinear conv head. Measured (15-epoch
                            probes, noisy 20.40 dB): skip-frozen-noise
                            21.12, head2 28.65, head3 29.36 dB.
  cnn-head-baseline         the bare 2-block head on raw pixels, NO trunk
                            — the ablation for how much context the trunk
                            adds.

All probes ride the flash training kernels.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/denoise_probe.py [tags...]
"""
from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo/examples")
from convergence_sidd import BATCH, N_TRAIN, N_VAL, make_pairs  # noqa: E402

from vit_unet_tpu.models.hvit_unet_tf import HViTUNetTF, HViTUNetTFConfig
from vit_unet_tpu.models.vit_unet import get_vit_unet
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.train.losses import mse
from vit_unet_tpu.train.metrics import psnr

EPOCHS = 15


def probe(tag: str, model, channels_last: bool, peak_lr: float,
          epochs: int = EPOCHS, fresh_noise: bool = False):
    from convergence_sidd import NOISE_SIGMA, clean_images
    clean = clean_images(N_TRAIN, 0)
    xs, ys = make_pairs(N_TRAIN, 0)
    xv, yv = make_pairs(N_VAL, 777)
    if channels_last:
        xs, ys, xv, yv = (a.transpose(0, 2, 3, 1).copy()
                          for a in (xs, ys, xv, yv))
    noisy_psnr = float(jnp.mean(jax.jit(jax.vmap(psnr))(
        jnp.asarray(xv), jnp.asarray(yv))))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, 50, epochs * (N_TRAIN // BATCH))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.asarray(xs[:1]))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse, metrics={"psnr": psnr})
    n_steps = N_TRAIN // BATCH
    hist = []
    t0 = time.time()
    for ep in range(epochs):
        if fresh_noise:
            # resample the AWGN on the same clean content each epoch — the
            # model cannot memorise train noise, so descending the train
            # loss REQUIRES denoising (MMSE estimator), matching
            # convergence_sidd.run_denoise's recipe
            rng = np.random.default_rng(1000 + ep)
            xs = (clean + rng.normal(scale=NOISE_SIGMA, size=clean.shape)
                  .astype(np.float32))
            ys = clean
            if channels_last:
                xs = xs.transpose(0, 2, 3, 1).copy()
                ys = ys.transpose(0, 2, 3, 1).copy()
        order = np.random.default_rng(ep).permutation(N_TRAIN)
        for s in range(n_steps):
            idx = order[s * BATCH:(s + 1) * BATCH]
            state, m = steps.train_step(
                state, {"x": jnp.asarray(xs[idx]), "y": jnp.asarray(ys[idx])})
        tl = float(m["loss"])
        vp = float(np.mean([
            float(steps.eval_step(state, {
                "x": jnp.asarray(xv[s * BATCH:(s + 1) * BATCH]),
                "y": jnp.asarray(yv[s * BATCH:(s + 1) * BATCH])})["psnr"])
            for s in range(N_VAL // BATCH)]))
        hist.append(round(vp, 3))
        print(f"[{tag}] ep {ep+1}: train {tl:.5f} val {vp:.2f} dB "
              f"(noisy {noisy_psnr:.2f})", flush=True)
    return {"tag": tag, "noisy": round(noisy_psnr, 2), "val_psnr": hist,
            "best": max(hist), "gain_db": round(max(hist) - noisy_psnr, 2),
            "wall_s": round(time.time() - t0, 1)}


def build(tag: str):
    if tag == "vitunet-nores":
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0), False, 1e-3)
    if tag == "vitunet-gain":
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, global_residual=True,
            residual_gain=True), False, 1e-3)
    if tag == "vitunet-skip":
        # input skip to the output conv, no residual: the head can copy the
        # input through (identity trivially reachable) AND filter it
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, input_skip=True), False, 1e-3)
    if tag == "vitunet-skip-res":
        # input skip + plain global residual: the branch can express local
        # high-pass corrections directly from pixels
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, input_skip=True,
            global_residual=True), False, 1e-3)
    if tag == "vitunet-skip-fresh":
        # control: the run_denoise recipe (input_skip + fresh noise/epoch)
        # at probe budget
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, input_skip=True), False, 1e-3,
            fresh_noise=True)
    if tag == "vitunet-skip-head2":
        # input skip + 2-block nonlinear conv head: the head can compute
        # content-adaptive local filters instead of one linear 3x3
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, input_skip=True,
            head_blocks=2, head_dim=32), False, 1e-3, fresh_noise=True)
    if tag == "vitunet-skip-head3":
        return probe(tag, get_vit_unet(
            "lite", im_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, flash_train=True, flash_frozen_bn=True,
            attn_drop=0.0, proj_drop=0.0, input_skip=True,
            head_blocks=3, head_dim=48), False, 1e-3, fresh_noise=True)
    if tag == "cnn-head-baseline":
        # ablation: the SAME head (2x Conv3x3-32-GELU + Conv3x3) on the raw
        # input alone, NO attention trunk — quantifies how much of
        # vitunet-skip-head2's gain the trunk's context actually adds
        from flax import linen as fnn

        class HeadOnly(fnn.Module):
            @fnn.compact
            def __call__(self, x, *, deterministic=True,
                         use_running_average=True):
                h = x.transpose(0, 2, 3, 1)
                h = fnn.gelu(fnn.Conv(32, (3, 3), padding="SAME",
                                      dtype=jnp.bfloat16)(h))
                h = fnn.gelu(fnn.Conv(32, (3, 3), padding="SAME",
                                      dtype=jnp.bfloat16)(h))
                return fnn.Conv(3, (3, 3), padding="SAME",
                                dtype=jnp.bfloat16)(h).astype(
                    jnp.float32).transpose(0, 3, 1, 2)

        return probe(tag, HeadOnly(), False, 1e-3, fresh_noise=True)
    if tag == "tf-gain":
        return probe(tag, HViTUNetTF(HViTUNetTFConfig(
            img_size=128, dtype="bfloat16", param_dtype="bfloat16",
            use_flash=True, drop_attn=0.0, drop_proj=0.0, drop_linear=0.0,
            residual_gain=True)), True, 3e-4)
    raise SystemExit(f"unknown tag {tag}")


if __name__ == "__main__":
    tags = sys.argv[1:] or ["vitunet-nores", "vitunet-gain", "tf-gain"]
    out = [build(t) for t in tags]
    print(json.dumps(out, indent=1))
