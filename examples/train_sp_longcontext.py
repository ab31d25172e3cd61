"""Long-context training: sequence parallelism x data parallelism.

The reference caps images at 512² because its finest level is quadratically
attention-bound (N = 4096 tokens there — SURVEY.md §5); it has no answer
past one device.  This example trains ViT-UNet with the token axis of every
fine level sharded over the mesh's ``model`` axis (gather-based sequence
parallelism over ICI, ``parallel/sequence.py``) while the batch rides the
``data`` axis — and the per-shard attention still runs the fused flash
kernels (rectangular: local query rows vs the all-gathered K/V), so no
(n_local, N) map ever reaches HBM on any chip.

On real hardware:      python examples/train_sp_longcontext.py --im_size 512
On the virtual mesh:   JAX_PLATFORMS=cpu \
                       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                       python examples/train_sp_longcontext.py \
                           --im_size 128 --steps 2 --batch 2
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig
from vit_unet_tpu.parallel.mesh import create_mesh
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.train.losses import mse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--im_size", type=int, default=512)
    p.add_argument("--patch_size", type=int, default=32)
    p.add_argument("--hidden_dim", type=int, default=48)
    p.add_argument("--model_parallel", type=int, default=2,
                   help="sequence shards (the mesh 'model' axis)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--sp_min_tokens", type=int, default=1024,
                   help="only levels with >= this many tokens shard")
    p.add_argument("--exact_bn", action="store_true",
                   help="exact batch-stats BN (default: frozen-BN fast mode)")
    args = p.parse_args(argv)

    mesh = create_mesh(model_parallel=args.model_parallel)
    print(f"mesh: {dict(mesh.shape)} on {mesh.devices.reshape(-1)[0].platform}")

    cfg = ViTUNetConfig(
        depth=2, depth_te=1, size_bottleneck=1, preprocessing="conv",
        im_size=args.im_size, patch_size=args.patch_size, num_channels=3,
        hidden_dim=args.hidden_dim, num_heads=4,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0,
        use_flash=True, flash_train=True,
        flash_frozen_bn=not args.exact_bn,
        sequence_parallel=True, sp_min_tokens=args.sp_min_tokens)
    fine_tokens = cfg.level_geometry(cfg.depth)["num_patches"]
    print(f"finest level: {fine_tokens} tokens, "
          f"{fine_tokens // args.model_parallel} rows/shard")

    model = ViTUNet(cfg, mesh=mesh)
    tx = optax.adamw(3e-4)
    rng = np.random.default_rng(0)
    shape = (args.batch, 3, args.im_size, args.im_size)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    batch = {"x": x, "y": x * 0.8}

    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse, mesh=mesh)

    for i in range(args.steps):
        t0 = time.perf_counter()
        state, m = steps.train_step(state, batch)
        loss = float(m["loss"])                 # scalar D2H = step barrier
        dt = time.perf_counter() - t0
        tag = " (compile)" if i == 0 else ""
        print(f"step {i}: loss {loss:.4f}  {dt*1e3:8.1f} ms{tag}")


if __name__ == "__main__":
    main()
