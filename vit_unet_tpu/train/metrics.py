"""On-device, jittable evaluation metrics (SURVEY.md §5).

Replaces the reference's mixed bag — CPU skimage PSNR with a hardcoded device
(``torch/functions.py:7-19``), on-graph ``tf.image.psnr`` (TF notebook cell
19), precision/recall/F1 (``TPUs_in_Colab.ipynb`` cell 26), and the never-
implemented soft-Dice (``README.md:89-102``) — with pure-JAX versions that
run inside the jitted eval step on TPU (no D2H copies per batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR (dB), averaged over the batch.

    Matches ``tf.image.psnr`` / skimage semantics: MSE per image over
    (C, H, W), PSNR = 10*log10(max_val² / MSE).
    """
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean(jnp.square(pred - target), axis=axes)
    return jnp.mean(10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Structural similarity, standard Gaussian-window (11, 1.5) formulation
    (Wang et al. 2004, as in tf.image.ssim / ignite).

    Accepts (B, C, H, W) or (B, H, W, C) — channels-last inputs (the TF
    model orientation) are detected by a thin (≤ 8) trailing axis and
    transposed; without this the 11×11 VALID window exceeded the 3-wide
    "width" axis and the metric returned NaN."""
    if (pred.ndim == 4 and pred.shape[-1] <= 8
            and pred.shape[-1] < pred.shape[1]):
        pred = pred.transpose(0, 3, 1, 2)
        target = target.transpose(0, 3, 1, 2)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    kernel = _gaussian_kernel()[None, None]              # (1, 1, 11, 11)
    c = pred.shape[1]
    kernel = jnp.tile(kernel, (c, 1, 1, 1))              # depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_pp = filt(pred * pred) - mu_pp
    sigma_tt = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(num / den)


def dice_score(pred: jnp.ndarray, target: jnp.ndarray,
               smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice coefficient (1 - dice_loss), README.md:89-102."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    intersection = jnp.sum(p * t)
    return (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def precision_recall_f1(pred: jnp.ndarray, target: jnp.ndarray,
                        threshold: float = 0.5) -> dict:
    """Binary P/R/F1 (TPUs_in_Colab.ipynb cell 26 equivalents), on-device."""
    p = (pred >= threshold).astype(jnp.float32)
    t = (target >= threshold).astype(jnp.float32)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    return {"precision": precision, "recall": recall, "f1": f1}


def accuracy(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Categorical accuracy from logits vs one-hot targets (keras 'acc',
    TPUs_in_Colab.ipynb cell 27)."""
    return jnp.mean((jnp.argmax(logits, axis=-1)
                     == jnp.argmax(target, axis=-1)).astype(jnp.float32))


def f1(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary-rounded F1 over all entries (the ``f1_m`` keras metric,
    TPUs_in_Colab.ipynb cell 26 — clips+rounds probabilities elementwise)."""
    p = jnp.round(jnp.clip(jax.nn.softmax(logits, axis=-1), 0, 1))
    return precision_recall_f1(p, target)["f1"]


def dice_from_logits(logits: jnp.ndarray, target: jnp.ndarray,
                     threshold: float = 0.5) -> jnp.ndarray:
    """Hard Dice on thresholded sigmoid probabilities — the evaluation form
    for a logits-output segmentation head (train with ``dice_bce``)."""
    pred = (jax.nn.sigmoid(logits) >= threshold).astype(jnp.float32)
    return dice_score(pred, target, smooth=1e-6)


METRICS = {
    "psnr": psnr,
    "ssim": ssim,
    "dice": dice_score,
    "dice_logits": dice_from_logits,
    "accuracy": accuracy,
    "f1": f1,
}


def get_metric(name: str):
    if name not in METRICS:
        raise ValueError(f"unknown metric {name!r}; choose from {sorted(METRICS)}")
    return METRICS[name]
