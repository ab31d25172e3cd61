"""End-to-end CLI smoke test: synthetic clean/noisy pairs -> train 1 epoch
-> PSNR report (the reference's `run_denoising.py` flow, README.md:104-107)."""
from __future__ import annotations

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_pairs(root, n=8, size=48):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "clean"), exist_ok=True)
    os.makedirs(os.path.join(root, "noisy"), exist_ok=True)
    for i in range(n):
        clean = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        noisy = np.clip(clean.astype(np.int16)
                        + rng.integers(-20, 20, clean.shape), 0, 255
                        ).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "clean", f"img_{i:03d}.png"), clean)
        cv2.imwrite(os.path.join(root, "noisy", f"img_{i:03d}.png"), noisy)


def test_run_denoising_cli_end_to_end(tmp_path, monkeypatch):
    from vit_unet_tpu.cli.run_denoising import main

    data_dir = str(tmp_path / "ssid")
    _make_pairs(data_dir, n=8, size=48)
    monkeypatch.chdir(tmp_path)

    result = main([
        "--input_folder", data_dir,
        "--n_epochs", "1",
        "--folds", "1",
        "--model_string", "lite",
        "--im_size", "64",
        "--batch_size", "4",
        "--num_workers", "0",
        "--checkpoint_dir", str(tmp_path / "models"),
        "--log_jsonl", str(tmp_path / "log.jsonl"),
    ])
    assert "psnr_mean" in result
    assert np.isfinite(result["psnr_mean"])
    # best checkpoint written and JSONL log populated
    assert os.path.exists(tmp_path / "log.jsonl")


def test_run_segmentation_cli_end_to_end(tmp_path, monkeypatch):
    """--task segment: images/+masks/ folder -> 1-channel logits head trained
    with dice_bce -> Dice report (README.md:85-102, the task the reference
    spec'd but never wired up)."""
    from vit_unet_tpu.cli.run_denoising import main

    rng = np.random.default_rng(3)
    root = tmp_path / "pancreas"
    os.makedirs(root / "images")
    os.makedirs(root / "masks")
    for i in range(8):
        img = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
        mask = np.zeros((48, 48), np.uint8)
        r0, c0 = rng.integers(0, 24, 2)
        mask[r0:r0 + 20, c0:c0 + 20] = 255
        cv2.imwrite(str(root / "images" / f"img_{i:03d}.png"), img)
        cv2.imwrite(str(root / "masks" / f"img_{i:03d}.png"), mask)
    monkeypatch.chdir(tmp_path)

    result = main([
        "--task", "segment",
        "--input_folder", str(root),
        "--n_epochs", "1",
        "--folds", "1",
        "--model_string", "lite",
        "--im_size", "64",
        "--batch_size", "4",
        "--num_workers", "0",
        "--checkpoint_dir", str(tmp_path / "models"),
    ])
    assert "dice_mean" in result
    assert 0.0 <= result["dice_mean"] <= 1.0


def test_deblur_derain_dataset_layouts(tmp_path):
    """--task deblur/derain dataset discovery uses the GoPro / Rain folder
    names (sharp/blur, norain/rain)."""
    from vit_unet_tpu.data.datasets import DeblurringDataset, DerainingDataset

    rng = np.random.default_rng(4)
    for sub in ("sharp", "blur", "norain", "rain"):
        os.makedirs(tmp_path / sub)
        for i in range(3):
            img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / sub / f"{i}.png"), img)

    for cls in (DeblurringDataset, DerainingDataset):
        ds = cls.from_folder(str(tmp_path), im_size=32)
        assert len(ds) == 3
        item = ds[0]
        assert item["x"].shape == (3, 32, 32)
        assert item["y"].shape == (3, 32, 32)


def test_run_classification_cli_end_to_end(tmp_path, monkeypatch):
    from vit_unet_tpu.cli.run_classification import main

    rng = np.random.default_rng(1)
    root = tmp_path / "imgs"
    for cname in ("cats", "dogs"):
        os.makedirs(root / cname)
        for i in range(6):
            img = rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
            cv2.imwrite(str(root / cname / f"{i}.png"), img)
    monkeypatch.chdir(tmp_path)

    result = main([
        "--input_folder", str(root),
        "--n_epochs", "1",
        "--batch_size", "4",
        "--im_size", "32",
        "--patch_size", "8",
        "--depth", "1",
        "--depth_te", "1",
        "--hidden_dim", "32",
        "--num_heads", "4",
        "--num_workers", "0",
        "--checkpoint_dir", str(tmp_path / "models"),
    ])
    assert "val_accuracy" in result
    assert 0.0 <= result["val_accuracy"] <= 1.0
