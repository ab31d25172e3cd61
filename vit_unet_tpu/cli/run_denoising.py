"""Denoising training CLI — reproduces the reference's entry point.

``python run_denoising.py --model_string lite --im_size 224`` trains K folds
of ViT-UNet on a paired clean/noisy folder and reports PSNR mean/std, like
``/root/reference/run_denoising.py:16-117`` — with the training loop,
checkpointing and metrics all first-party (no benatools/wandb/fire
dependencies; wandb is used only if installed AND credentials come from the
environment — the reference's hardcoded API key is deliberately not
reproduced, SURVEY.md §2.5.6).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", type=str, default="ssid",
                   help="root with clean/ and noisy/ subfolders")
    p.add_argument("--n_epochs", type=int, default=100)
    p.add_argument("--folds", type=int, default=1,
                   help="number of CV folds to actually train (of 5)")
    p.add_argument("--model_string", type=str, default="lite",
                   choices=["lite", "base", "large", "notebook512"])
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--im_size", type=int, default=224)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--checkpoint_dir", type=str, default="models")
    p.add_argument("--loss", type=str, default="mse")
    p.add_argument("--dtype", type=str, default="float32",
                   help="compute dtype, e.g. bfloat16 for TPU throughput")
    p.add_argument("--flash", action="store_true",
                   help="fused Pallas re-attention kernels (eval + training)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--log_jsonl", type=str, default=None)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    from vit_unet_tpu.data.augment import eval_transforms, train_transforms
    from vit_unet_tpu.data.datasets import DenoisingDataset, kfold_split
    from vit_unet_tpu.data.loader import DataLoader
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    from vit_unet_tpu.parallel.mesh import create_mesh
    from vit_unet_tpu.train.callbacks import JSONLLogger, ReduceLROnPlateau
    from vit_unet_tpu.train.fitter import Fitter

    # dataset discovery + pairing (run_denoising.py:36-41)
    probe = DenoisingDataset.from_folder(
        args.input_folder, im_size=args.im_size)
    n = len(probe)
    if n == 0:
        raise SystemExit(
            f"no clean/noisy pairs found under {args.input_folder!r} "
            "(expected clean/ and noisy/ subfolders with matching images)")
    print(f"found {n} clean/noisy pairs in {args.input_folder}")

    mesh = create_mesh(model_parallel=1) if args.data_parallel else None

    psnrs = []
    for fold, (train_idx, val_idx) in enumerate(kfold_split(n, 5)):
        if fold >= args.folds:
            break
        print(f"===== fold {fold} =====")
        train_ds = DenoisingDataset.from_folder(
            args.input_folder, im_size=args.im_size,
            transforms=train_transforms(args.im_size), indices=train_idx)
        val_ds = DenoisingDataset.from_folder(
            args.input_folder, im_size=args.im_size,
            transforms=eval_transforms(args.im_size), indices=val_idx)
        train_dl = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.num_workers)
        # evaluation sees every sample: no remainder dropping (the one extra
        # partial-batch compile is paid once)
        val_dl = DataLoader(val_ds, min(args.batch_size, len(val_ds)),
                            shuffle=False, drop_remainder=False,
                            num_workers=args.num_workers)

        model = get_vit_unet(args.model_string, im_size=args.im_size,
                             dtype=args.dtype, use_flash=args.flash,
                             flash_train=args.flash)
        fitter = Fitter(model, learning_rate=args.lr, optimizer="adamw",
                        loss=args.loss, metrics=("psnr", "ssim"), mesh=mesh,
                        scale_lr_by_replicas=args.data_parallel,
                        checkpoint_dir=os.path.join(args.checkpoint_dir,
                                                    f"fold{fold}"))
        callbacks = [ReduceLROnPlateau()]
        if args.log_jsonl:
            callbacks.append(JSONLLogger(args.log_jsonl))
        fitter.fit(lambda: iter(train_dl), lambda: iter(val_dl),
                   n_epochs=args.n_epochs, callbacks=callbacks)
        # reload best checkpoint and evaluate (run_denoising.py:100-105)
        fitter.load()
        final = fitter.evaluate(lambda: iter(val_dl))
        print(f"fold {fold}: {final}")
        psnrs.append(final["val_psnr"])

    result = {"psnr_mean": float(np.mean(psnrs)),
              "psnr_std": float(np.std(psnrs))}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
