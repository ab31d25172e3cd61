"""Restoration/segmentation training CLI — the reference's entry point,
extended to every README task.

``python run_denoising.py --model_string lite --im_size 224`` trains K folds
of ViT-UNet on a paired clean/noisy folder and reports PSNR mean/std, like
``/root/reference/run_denoising.py:16-117`` — with the training loop,
checkpointing and metrics all first-party (no benatools/wandb/fire
dependencies; wandb is used only if installed AND credentials come from the
environment — the reference's hardcoded API key is deliberately not
reproduced, SURVEY.md §2.5.6).

``--task`` selects among the reference's README tasks (README.md:71-102):
``denoise`` (SIDD clean/noisy), ``deblur`` (GoPro sharp/blur), ``derain``
(norain/rain), and ``segment`` (images/masks, 1-channel logits head trained
with soft-Dice+BCE, reported as Dice) — the reference implemented only the
denoising entry point; the other tasks existed as dataset classes/specs.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

#: per-task wiring: dataset class name, default loss, metrics, headline metric
TASKS = {
    "denoise": dict(dataset="DenoisingDataset", loss="mse",
                    metrics=("psnr", "ssim"), headline="psnr"),
    "deblur": dict(dataset="DeblurringDataset", loss="mse",
                   metrics=("psnr", "ssim"), headline="psnr"),
    "derain": dict(dataset="DerainingDataset", loss="mse",
                   metrics=("psnr", "ssim"), headline="psnr"),
    "segment": dict(dataset="SegmentationFolderDataset", loss="dice_bce",
                    metrics=("dice_logits",), headline="dice_logits"),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", type=str, default="denoise",
                   choices=sorted(TASKS), help="which README task to train")
    p.add_argument("--input_folder", type=str, default="ssid",
                   help="root with clean/+noisy/ (denoise), sharp/+blur/ "
                        "(deblur), norain/+rain/ (derain) or images/+masks/ "
                        "(segment) subfolders")
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
    p.add_argument("--loss", type=str, default=None,
                   help="override the task's default loss "
                        "(mse for restoration, dice_bce for segmentation)")
    p.add_argument("--dtype", type=str, default="float32",
                   help="compute dtype, e.g. bfloat16 for TPU throughput")
    p.add_argument("--flash", action="store_true",
                   help="fused Pallas re-attention kernels (eval + training)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--log_jsonl", type=str, default=None)
    p.add_argument("--bn_freeze_epochs", type=int, default=0,
                   help="frozen-BN warmup epochs before flipping to exact "
                        "batch-stats BN (see Fitter docstring)")
    p.add_argument("--bn_warmup", type=str, default="refold",
                   choices=("refold", "freeze", "track"),
                   help="what happens at the warmup flip: 'refold' is the "
                        "stat-matched function-preserving flip "
                        "(train/bn_refold.py)")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    from vit_unet_tpu.data import datasets as ds_mod
    from vit_unet_tpu.data.augment import eval_transforms, train_transforms
    from vit_unet_tpu.data.datasets import kfold_split
    from vit_unet_tpu.data.loader import DataLoader
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    from vit_unet_tpu.parallel.mesh import create_mesh
    from vit_unet_tpu.train.callbacks import JSONLLogger, ReduceLROnPlateau
    from vit_unet_tpu.train.fitter import Fitter

    task = TASKS[args.task]
    dataset_cls = getattr(ds_mod, task["dataset"])
    loss = args.loss or task["loss"]
    headline = task["headline"]

    # dataset discovery + pairing (run_denoising.py:36-41)
    probe = dataset_cls.from_folder(args.input_folder, im_size=args.im_size)
    n = len(probe)
    if n == 0:
        raise SystemExit(
            f"no sample pairs found under {args.input_folder!r} for task "
            f"{args.task!r} (see --input_folder help for the layout)")
    print(f"found {n} {args.task} pairs in {args.input_folder}")

    mesh = create_mesh(model_parallel=1) if args.data_parallel else None

    scores = []
    for fold, (train_idx, val_idx) in enumerate(kfold_split(n, 5)):
        if fold >= args.folds:
            break
        print(f"===== fold {fold} =====")
        train_ds = dataset_cls.from_folder(
            args.input_folder, im_size=args.im_size,
            transforms=train_transforms(args.im_size), indices=train_idx)
        val_ds = dataset_cls.from_folder(
            args.input_folder, im_size=args.im_size,
            transforms=eval_transforms(args.im_size), indices=val_idx)
        train_dl = DataLoader(train_ds, args.batch_size, shuffle=True,
                              num_workers=args.num_workers)
        # evaluation sees every sample: no remainder dropping (the one extra
        # partial-batch compile is paid once)
        val_dl = DataLoader(val_ds, min(args.batch_size, len(val_ds)),
                            shuffle=False, drop_remainder=False,
                            num_workers=args.num_workers)

        overrides = {}
        if args.task == "segment":
            overrides["out_channels"] = 1   # logits head for the binary mask
        model = get_vit_unet(args.model_string, im_size=args.im_size,
                             dtype=args.dtype, use_flash=args.flash,
                             flash_train=args.flash, **overrides)
        fitter = Fitter(model, learning_rate=args.lr, optimizer="adamw",
                        loss=loss, metrics=task["metrics"], mesh=mesh,
                        scale_lr_by_replicas=args.data_parallel,
                        checkpoint_dir=os.path.join(args.checkpoint_dir,
                                                    f"fold{fold}"),
                        bn_freeze_epochs=args.bn_freeze_epochs,
                        bn_warmup=args.bn_warmup)
        callbacks = [ReduceLROnPlateau()]
        if args.log_jsonl:
            callbacks.append(JSONLLogger(args.log_jsonl))
        fitter.fit(lambda: iter(train_dl), lambda: iter(val_dl),
                   n_epochs=args.n_epochs, callbacks=callbacks)
        # reload best checkpoint and evaluate (run_denoising.py:100-105)
        fitter.load()
        final = fitter.evaluate(lambda: iter(val_dl))
        print(f"fold {fold}: {final}")
        scores.append(final[f"val_{headline}"])

    key = "psnr" if headline == "psnr" else "dice"
    result = {f"{key}_mean": float(np.mean(scores)),
              f"{key}_std": float(np.std(scores))}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
