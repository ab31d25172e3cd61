"""Losses — all jittable, on-device (SURVEY.md §5 metrics/loss layer).

Covers the reference's training objectives: MSE (``run_denoising.py:80``,
TF notebook cell 19) and the README soft-Dice spec (``README.md:89-102``),
plus standard restoration extras (MAE, Charbonnier) the target tasks
(SIDD/GoPro/derain) conventionally use.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray,
                eps: float = 1e-3) -> jnp.ndarray:
    """Robust L1 variant used by SIDD/GoPro restoration SOTA."""
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def soft_dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice loss per the README spec (README.md:89-102): flatten,
    1 - (2*intersection + s) / (sum(p) + sum(t) + s)."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    intersection = jnp.sum(p * t)
    return 1.0 - (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy for segmentation heads."""
    log_p = jnp.clip(logits, a_min=None, a_max=0) - jnp.log1p(jnp.exp(-jnp.abs(logits)))
    log_not_p = log_p - logits
    return -jnp.mean(target * log_p + (1.0 - target) * log_not_p)


def categorical_crossentropy(logits: jnp.ndarray, target: jnp.ndarray,
                             label_smoothing: float = 0.0) -> jnp.ndarray:
    """Softmax cross-entropy from logits with label smoothing — the
    classifier recipe (``TPUs_in_Colab.ipynb`` cell 27:
    ``CategoricalCrossentropy(from_logits=True, label_smoothing=.05)``)."""
    num_classes = logits.shape[-1]
    if label_smoothing:
        target = (target * (1.0 - label_smoothing)
                  + label_smoothing / num_classes)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target * log_probs, axis=-1))


def ssim_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − SSIM on (B, C, H, W) images — the perceptual objective
    restoration SOTA (SIDD/GoPro leaderboards) commonly mixes with L1."""
    from vit_unet_tpu.train.metrics import ssim
    return 1.0 - ssim(pred, target)


def charbonnier_ssim(pred: jnp.ndarray, target: jnp.ndarray,
                     alpha: float = 0.84) -> jnp.ndarray:
    """α·(1−SSIM) + (1−α)·Charbonnier — the standard restoration mix
    (Zhao et al. 2017 weighting)."""
    return (alpha * ssim_loss(pred, target)
            + (1.0 - alpha) * charbonnier(pred, target))


def dice_bce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Soft-Dice (on sigmoid probabilities) + BCE-with-logits — the standard
    compound objective for the README's binary-segmentation task
    (README.md:85-102; the reference spec'd soft-Dice but never wired a
    training head for it)."""
    probs = jax.nn.sigmoid(logits)
    return soft_dice_loss(probs, target) + bce_with_logits(logits, target)


LOSSES = {
    "mse": mse,
    "mae": mae,
    "charbonnier": charbonnier,
    "ssim": ssim_loss,
    "charbonnier_ssim": charbonnier_ssim,
    "soft_dice": soft_dice_loss,
    "bce": bce_with_logits,
    "dice_bce": dice_bce,
    "categorical_crossentropy": categorical_crossentropy,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; choose from {sorted(LOSSES)}")
    return LOSSES[name]
