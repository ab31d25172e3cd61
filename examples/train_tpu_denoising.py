"""TPU data-parallel denoising training — the ``ViT_UNet_TF_TPU.ipynb``
recipe, TPU-native.

Reproduces the notebook's shape (cells 7-25): seed_everything, device mesh
(the TPUStrategy replacement), model under the mesh with lr x replicas
(cell 19's ``Adam(lr * REPLICAS)``), TFRecord/tf.data streaming input,
ModelCheckpoint/ReduceLROnPlateau-style callbacks, fit, then PSNR probes
(cell 25's noisy-vs-clean / pred-vs-clean / pred-vs-noisy trio).

    python examples/train_tpu_denoising.py --tfrec "tfrec/ssid_fold_0_*" \
        --epochs 10 --per_replica_batch 8
"""
from __future__ import annotations

import argparse
import glob

import jax
import jax.numpy as jnp
import numpy as np

from vit_unet_tpu.data.loader import tfrecord_dataset, DataLoader
from vit_unet_tpu.models.vit_unet import get_vit_unet
from vit_unet_tpu.parallel.mesh import create_mesh, replica_count
from vit_unet_tpu.train.callbacks import EarlyStopping, ReduceLROnPlateau
from vit_unet_tpu.train.fitter import Fitter
from vit_unet_tpu.train.metrics import psnr
from vit_unet_tpu.utils.seeding import seed_everything


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tfrec", required=True, help="glob of TFRecord shards")
    p.add_argument("--shape", type=int, nargs=3, default=(128, 128, 3),
                   help="stored image H W C")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--per_replica_batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-6,
                   help="base LR; scaled by replica count like the notebook")
    p.add_argument("--model", default="base")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--flash", action="store_true",
                   help="fused Pallas attention path (training too)")
    args = p.parse_args(argv)

    seed_everything(42)
    mesh = create_mesh(model_parallel=1)            # pure DP, like the ref
    replicas = replica_count(mesh)
    global_batch = args.per_replica_batch * replicas
    print(f"replicas: {replicas}  global batch: {global_batch}")

    paths = sorted(glob.glob(args.tfrec))
    ds = tfrecord_dataset(paths, tuple(args.shape))
    n_val = max(1, len(ds) // 5)
    train_dl = DataLoader(ds, global_batch, shuffle=True)
    val_dl = DataLoader(ds, global_batch, drop_remainder=False)

    # train at the stored resolution (the model's internal resize only
    # touches x; targets stay at the stored size — like the TF notebook,
    # which trains 128² natively)
    h, w, _ = args.shape
    assert h == w, "stored images must be square"
    model = get_vit_unet(args.model, im_size=h, dtype=args.dtype,
                         use_flash=args.flash, flash_train=args.flash)
    fitter = Fitter(model, learning_rate=args.lr, optimizer="adam",
                    loss="mse", metrics=("psnr",), mesh=mesh,
                    scale_lr_by_replicas=True)      # Adam(lr*REPLICAS)
    fitter.fit(lambda: iter(train_dl), lambda: iter(val_dl),
               n_epochs=args.epochs, save_last=True,
               callbacks=[ReduceLROnPlateau(patience=1, factor=0.5),
                          EarlyStopping(patience=4)])
    fitter.load()

    # the notebook's 3-way PSNR probe (cell 25)
    sample = next(iter(val_dl))
    pred = fitter.predict(sample["x"])
    x = jnp.asarray(sample["x"], jnp.float32)
    y = jnp.asarray(sample["y"], jnp.float32)
    print(f"PSNR noisy-vs-clean: {float(psnr(x, y)):.2f} dB")
    print(f"PSNR pred-vs-clean:  {float(psnr(pred.astype(jnp.float32), y)):.2f} dB")
    print(f"PSNR pred-vs-noisy:  {float(psnr(pred.astype(jnp.float32), x)):.2f} dB")


if __name__ == "__main__":
    main()
