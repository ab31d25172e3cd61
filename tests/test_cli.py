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
