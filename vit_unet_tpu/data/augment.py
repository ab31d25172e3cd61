"""First-party image augmentations (numpy, per-sample).

Replaces the reference's albumentations usage (``run_denoising.py:52-59``:
Resize + ShiftScaleRotate for train, Resize only for eval) without the
external dependency.  Paired transforms apply identical geometry to image and
target — the reference achieves this with albumentations' image/mask trick
(``torch/dataset.py:61-63``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import cv2
import numpy as np


@dataclasses.dataclass
class ShiftScaleRotate:
    """Random affine jitter, matching albumentations' parameter surface."""

    shift_limit: float = 0.0625
    scale_limit: float = 0.1
    rotate_limit: float = 45.0
    p: float = 0.5

    def __call__(self, rng: np.random.Generator,
                 image: np.ndarray, target: Optional[np.ndarray] = None):
        if rng.random() >= self.p:
            return image, target
        h, w = image.shape[:2]
        angle = rng.uniform(-self.rotate_limit, self.rotate_limit)
        scale = 1.0 + rng.uniform(-self.scale_limit, self.scale_limit)
        dx = rng.uniform(-self.shift_limit, self.shift_limit) * w
        dy = rng.uniform(-self.shift_limit, self.shift_limit) * h
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
        m[0, 2] += dx
        m[1, 2] += dy
        warp = lambda im: cv2.warpAffine(
            im, m, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REFLECT_101)
        return warp(image), (warp(target) if target is not None else None)


@dataclasses.dataclass
class HorizontalFlip:
    p: float = 0.5

    def __call__(self, rng, image, target=None):
        if rng.random() < self.p:
            image = image[:, ::-1]
            target = target[:, ::-1] if target is not None else None
        return image, target


@dataclasses.dataclass
class Resize:
    height: int
    width: int

    def __call__(self, rng, image, target=None):
        image = cv2.resize(image, (self.width, self.height),
                           interpolation=cv2.INTER_LINEAR)
        if target is not None:
            target = cv2.resize(target, (self.width, self.height),
                                interpolation=cv2.INTER_LINEAR)
        return image, target


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, rng, image, target=None):
        for t in self.transforms:
            image, target = t(rng, image, target)
        return image, target


def train_transforms(im_size: int) -> Compose:
    """The reference's train-time pipeline (run_denoising.py:52-56)."""
    return Compose([Resize(im_size, im_size), ShiftScaleRotate(p=0.5)])


def eval_transforms(im_size: int) -> Compose:
    return Compose([Resize(im_size, im_size)])


# --------------------------------------------------------------------------
# Batch-level transforms (the reference's cutmix/mixup hooks — present but
# off by default in ``load_dataset``, ViT_UNet_TF_TPU.ipynb cell 16).
# Jittable jnp versions: apply on-device after batching.
# --------------------------------------------------------------------------

import jax
import jax.numpy as jnp


def mixup(key, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 0.2,
          prob: float = 0.5):
    """Per-sample convex mixing with a rolled batch.  x: (B, ...) images,
    y: (B, ...) labels (one-hot) or paired targets — both mixed with the
    same weights, matching the notebook's label-mixing semantics."""
    bk, lk, pk = jax.random.split(key, 3)
    b = x.shape[0]
    lam = jax.random.beta(lk, alpha, alpha, (b,))
    lam = jnp.where(jax.random.uniform(pk, (b,)) < prob, lam, 1.0)
    lam_x = lam.reshape((b,) + (1,) * (x.ndim - 1))
    lam_y = lam.reshape((b,) + (1,) * (y.ndim - 1))
    x2 = jnp.roll(x, 1, axis=0)
    y2 = jnp.roll(y, 1, axis=0)
    return lam_x * x + (1 - lam_x) * x2, lam_y * y + (1 - lam_y) * y2


def cutmix(key, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 1.0,
           prob: float = 0.5):
    """CutMix on channel-first images (B, C, H, W): paste a random box from
    a rolled batch; labels mix by the box's area fraction."""
    bk, xk, yk, pk = jax.random.split(key, 4)
    b, _, h, w = x.shape
    lam = jax.random.beta(bk, alpha, alpha, (b,))
    apply = jax.random.uniform(pk, (b,)) < prob
    lam = jnp.where(apply, lam, 1.0)
    cut = jnp.sqrt(1.0 - lam)
    cw = (cut * w).astype(jnp.int32)
    ch = (cut * h).astype(jnp.int32)
    cx = jax.random.randint(xk, (b,), 0, w)
    cy = jax.random.randint(yk, (b,), 0, h)
    x1 = jnp.clip(cx - cw // 2, 0, w)
    x2_ = jnp.clip(cx + cw // 2, 0, w)
    y1 = jnp.clip(cy - ch // 2, 0, h)
    y2_ = jnp.clip(cy + ch // 2, 0, h)
    cols = jnp.arange(w)[None, None, None, :]
    rows = jnp.arange(h)[None, None, :, None]
    in_box = ((cols >= x1[:, None, None, None])
              & (cols < x2_[:, None, None, None])
              & (rows >= y1[:, None, None, None])
              & (rows < y2_[:, None, None, None]))
    xr = jnp.roll(x, 1, axis=0)
    mixed_x = jnp.where(in_box, xr, x)
    area = ((x2_ - x1) * (y2_ - y1)).astype(jnp.float32) / float(h * w)
    lam_eff = 1.0 - area
    yr = jnp.roll(y, 1, axis=0)
    lam_y = lam_eff.reshape((b,) + (1,) * (y.ndim - 1))
    return mixed_x, lam_y * y + (1 - lam_y) * yr


def batch_transforms(key, x: jnp.ndarray, y: jnp.ndarray,
                     prob: float = 0.66):
    """The notebook's combined hook (cell 16 ``batch_transforms``): compute
    cutmix and mixup variants, pick one per sample with p=0.5."""
    ck, mk, pk = jax.random.split(key, 3)
    x2, y2 = cutmix(ck, x, y, prob=prob)
    x3, y3 = mixup(mk, x, y, prob=prob)
    b = x.shape[0]
    pick = (jax.random.uniform(pk, (b,)) <= 0.5)
    px = pick.reshape((b,) + (1,) * (x.ndim - 1))
    py = pick.reshape((b,) + (1,) * (y.ndim - 1))
    return (jnp.where(px, x2, x3), jnp.where(py, y2, y3))
