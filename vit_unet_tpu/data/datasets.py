"""Dataset readers for the reference's tasks (SURVEY.md L4).

* ``DenoisingDataset`` — paired clean/noisy images (SIDD layout:
  ``{root}/clean/*.png`` + ``{root}/noisy/*.png``, matched by sorted order
  and asserted equal length, ``run_denoising.py:36-41``).  Replaces
  ``torch/dataset.py:44-73`` (cv2 read, resize, paired augmentation, /255,
  channel-major float32).
* ``DeblurringDataset`` / ``DerainingDataset`` — same pair structure with
  GoPro / Rain-style folder names (README tasks 2-3).
* ``SegmentationDataset`` — Pancreas-CT DICOM slices + NIfTI masks
  (``torch/dataset.py:9-41``), gated on pydicom/nibabel availability.
* ``kfold_split`` — the reference's KFold(5, shuffle, seed=42) protocol
  (run_denoising.py:43-46) without requiring sklearn at runtime.
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import cv2
import numpy as np


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"could not read image {path!r}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class PairedImageDataset:
    """Generic (input, target) image pairs with paired augmentation.

    Returns dict {'x', 'y'}: float32 in [0, 1].  ``channels_first=True``
    yields (C, H, W) (torch-flavour models); False yields (H, W, C).
    """

    def __init__(self, input_paths: Sequence[str], target_paths: Sequence[str],
                 im_size: int = 224, transforms=None, channels_first: bool = True,
                 seed: int = 0):
        if len(input_paths) != len(target_paths):
            raise ValueError("input/target path counts differ "
                             f"({len(input_paths)} vs {len(target_paths)})")
        self.input_paths = list(input_paths)
        self.target_paths = list(target_paths)
        self.im_size = im_size
        self.transforms = transforms
        self.channels_first = channels_first
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.input_paths)

    def __getitem__(self, idx: int) -> dict:
        x = _imread_rgb(self.input_paths[idx])
        y = _imread_rgb(self.target_paths[idx])
        if self.transforms is not None:
            x, y = self.transforms(self.rng, x, y)
        else:
            x = cv2.resize(x, (self.im_size, self.im_size))
            y = cv2.resize(y, (self.im_size, self.im_size))
        x = x.astype(np.float32) / 255.0
        y = y.astype(np.float32) / 255.0
        if self.channels_first:
            x = x.transpose(2, 0, 1)
            y = y.transpose(2, 0, 1)
        return {"x": x, "y": y}


class DenoisingDataset(PairedImageDataset):
    """SIDD pairs: x = noisy, y = clean (torch/dataset.py:44-73)."""

    @classmethod
    def from_folder(cls, root: str, im_size: int = 224, transforms=None,
                    channels_first: bool = True,
                    clean_dir: str = "clean", noisy_dir: str = "noisy",
                    indices: Optional[Sequence[int]] = None, **kw):
        clean = sorted(glob.glob(os.path.join(root, clean_dir, "*")))
        noisy = sorted(glob.glob(os.path.join(root, noisy_dir, "*")))
        if len(clean) != len(noisy):
            raise ValueError(
                f"unpaired dataset: {len(clean)} clean vs {len(noisy)} noisy")
        if indices is not None:
            clean = [clean[i] for i in indices]
            noisy = [noisy[i] for i in indices]
        return cls(noisy, clean, im_size=im_size, transforms=transforms,
                   channels_first=channels_first, **kw)


class DeblurringDataset(DenoisingDataset):
    """GoPro pairs: x = blur, y = sharp."""

    @classmethod
    def from_folder(cls, root: str, **kw):
        kw.setdefault("clean_dir", "sharp")
        kw.setdefault("noisy_dir", "blur")
        return super().from_folder(root, **kw)


class DerainingDataset(DenoisingDataset):
    """Rain100H/L-style pairs: x = rain, y = norain."""

    @classmethod
    def from_folder(cls, root: str, **kw):
        kw.setdefault("clean_dir", "norain")
        kw.setdefault("noisy_dir", "rain")
        return super().from_folder(root, **kw)


class SegmentationDataset:
    """Pancreas-CT: DICOM slice -> image, NIfTI slice -> binary mask
    (torch/dataset.py:9-41).  Requires pydicom + nibabel; raises a clear
    error otherwise (they are not part of the baked image)."""

    def __init__(self, dicom_paths: Sequence[str], label_paths: Sequence[str],
                 slices: Sequence[int], im_size: int = 224, transforms=None,
                 channels_first: bool = True, seed: int = 0):
        try:
            import nibabel  # noqa: F401
            import pydicom  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "SegmentationDataset needs pydicom and nibabel "
                "(pip install pydicom nibabel)") from e
        self.dicom_paths = list(dicom_paths)
        self.label_paths = list(label_paths)
        self.slices = list(slices)
        self.im_size = im_size
        self.transforms = transforms
        self.channels_first = channels_first
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.dicom_paths)

    def __getitem__(self, idx: int) -> dict:
        import nibabel as nib
        import pydicom

        ds = pydicom.dcmread(self.dicom_paths[idx])
        img = ds.pixel_array.astype(np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
        nii = nib.load(self.label_paths[idx])
        mask = np.asanyarray(nii.dataobj)[..., self.slices[idx]]
        mask = (np.asarray(mask) > 0).astype(np.float32)
        img = cv2.resize(img, (self.im_size, self.im_size))
        mask = cv2.resize(mask, (self.im_size, self.im_size),
                          interpolation=cv2.INTER_NEAREST)
        if self.transforms is not None:
            img, mask = self.transforms(self.rng, img, mask)
            # geometric transforms interpolate linearly; masks must stay
            # binary (albumentations does this via its image/mask split)
            mask = (mask > 0.5).astype(np.float32)
        x = np.repeat(img[..., None], 3, axis=-1)     # grayscale -> 3ch
        y = mask[..., None]
        if self.channels_first:
            x = x.transpose(2, 0, 1)
            y = y.transpose(2, 0, 1)
        return {"x": x.astype(np.float32), "y": y.astype(np.float32)}


class SegmentationFolderDataset(PairedImageDataset):
    """Binary segmentation from a PNG folder layout (``{root}/images/*`` +
    ``{root}/masks/*``, matched by sorted order) — the CLI-runnable form of
    the reference's README segmentation task (README.md:85-102); the
    Pancreas-CT DICOM/NIfTI reader is ``SegmentationDataset``.  Yields
    x (3, H, W) in [0, 1] and y (1, H, W) binary."""

    @classmethod
    def from_folder(cls, root: str, im_size: int = 224, transforms=None,
                    channels_first: bool = True,
                    image_dir: str = "images", mask_dir: str = "masks",
                    indices: Optional[Sequence[int]] = None, **kw):
        images = sorted(glob.glob(os.path.join(root, image_dir, "*")))
        masks = sorted(glob.glob(os.path.join(root, mask_dir, "*")))
        if len(images) != len(masks):
            raise ValueError(
                f"unpaired dataset: {len(images)} images vs {len(masks)} masks")
        if indices is not None:
            images = [images[i] for i in indices]
            masks = [masks[i] for i in indices]
        return cls(images, masks, im_size=im_size, transforms=transforms,
                   channels_first=channels_first, **kw)

    def __getitem__(self, idx: int) -> dict:
        x = _imread_rgb(self.input_paths[idx])
        mask = cv2.imread(self.target_paths[idx], cv2.IMREAD_GRAYSCALE)
        if mask is None:
            raise IOError(f"could not read mask {self.target_paths[idx]!r}")
        x = cv2.resize(x, (self.im_size, self.im_size))
        mask = cv2.resize(mask, (self.im_size, self.im_size),
                          interpolation=cv2.INTER_NEAREST)
        mask = (mask.astype(np.float32) > 0).astype(np.float32)
        if self.transforms is not None:
            x, mask = self.transforms(self.rng, x, mask)
            # geometric transforms interpolate; masks must stay binary
            mask = (np.asarray(mask) > 0.5).astype(np.float32)
        x = x.astype(np.float32) / 255.0
        y = mask[..., None]
        if self.channels_first:
            x = x.transpose(2, 0, 1)
            y = y.transpose(2, 0, 1)
        return {"x": x, "y": y.astype(np.float32)}


class ClassificationDataset:
    """Image-classification pairs from a class-subdirectory tree
    (``root/<class_name>/*.jpg|png``) — the layout the reference converts to
    TFRecords for its TPU classification pipeline (``TPUs_in_Colab.ipynb``
    cells 12-19).  Yields {'x': (C, H, W) float, 'y': one-hot (num_classes,)}.
    """

    EXTS = (".png", ".jpg", ".jpeg", ".bmp")

    def __init__(self, paths: Sequence[str], labels: Sequence[int],
                 num_classes: int, im_size: int = 224, transforms=None,
                 channels_first: bool = True, seed: int = 0):
        if len(paths) != len(labels):
            raise ValueError("paths/labels length mismatch")
        self.paths = list(paths)
        self.labels = list(labels)
        self.num_classes = num_classes
        self.im_size = im_size
        self.transforms = transforms
        self.channels_first = channels_first
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_folder(cls, root: str, im_size: int = 224, transforms=None,
                    indices: Optional[Sequence[int]] = None, **kw):
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        if not classes:
            raise ValueError(f"no class subdirectories under {root!r}")
        paths, labels = [], []
        for ci, cname in enumerate(classes):
            for p in sorted(glob.glob(os.path.join(root, cname, "*"))):
                if p.lower().endswith(cls.EXTS):
                    paths.append(p)
                    labels.append(ci)
        if indices is not None:
            paths = [paths[i] for i in indices]
            labels = [labels[i] for i in indices]
        ds = cls(paths, labels, num_classes=len(classes), im_size=im_size,
                 transforms=transforms, **kw)
        ds.class_names = classes
        return ds

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        img = _imread_rgb(self.paths[idx])
        img = cv2.resize(img, (self.im_size, self.im_size))
        if self.transforms is not None:
            img, _ = self.transforms(self.rng, img, None)
        x = img.astype(np.float32) / 255.0
        if self.channels_first:
            x = x.transpose(2, 0, 1)
        y = np.zeros(self.num_classes, np.float32)
        y[self.labels[idx]] = 1.0
        return {"x": x, "y": y}


def kfold_split(n: int, n_folds: int = 5, seed: int = 42):
    """Yield (train_idx, val_idx) per fold — KFold(5, shuffle, random_state=42)
    protocol of run_denoising.py:43."""
    if n_folds < 2:
        raise ValueError("kfold_split needs n_folds >= 2 (a single fold has "
                         "no train/val split)")
    if n < n_folds:
        raise ValueError(f"cannot split {n} samples into {n_folds} folds")
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    folds = np.array_split(order, n_folds)
    for k in range(n_folds):
        val = folds[k]
        train = np.concatenate([folds[j] for j in range(n_folds) if j != k])
        yield np.sort(train), np.sort(val)
