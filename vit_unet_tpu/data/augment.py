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
