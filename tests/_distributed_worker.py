"""Worker process for the two-process jax.distributed smoke test.

Run as: python tests/_distributed_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices (4 global), initialises the
collective runtime via ``initialize_distributed`` (the code under test,
parallel/mesh.py), feeds its own DataLoader shard of the global batch, and
runs ONE data-parallel train step over the global mesh.  Prints the loss and
a post-update parameter checksum; the parent asserts both processes agree
and match a single-process run of the same global batch.
"""
from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def synthetic_dataset(n: int = 16, im: int = 32):
    """Deterministic indexable dataset: sample i is a fixed function of i."""
    import numpy as np

    class DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            rng = np.random.default_rng(1000 + i)
            x = rng.normal(size=(3, im, im)).astype(np.float32)
            return {"x": x, "y": (x * 0.5).astype(np.float32)}

    return DS()


def build_model():
    from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig

    return ViTUNet(ViTUNetConfig(
        depth=2, depth_te=1, size_bottleneck=1, preprocessing="conv",
        im_size=32, patch_size=16, num_channels=3, hidden_dim=16,
        num_heads=2, attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))


def run_step(mesh, global_batch_arrays):
    """One DP train step; returns (loss, params_checksum) as floats."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit_unet_tpu.parallel.train_step import (TrainState,
                                                  build_step_functions)
    from vit_unet_tpu.train.losses import mse

    model = build_model()
    tx = optax.sgd(1e-2)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 32, 32)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse, mesh=mesh)
    if mesh is not None and jax.process_count() > 1:
        # host-local state -> global (replicated) arrays on the global mesh
        from jax.experimental import multihost_utils

        state = multihost_utils.host_local_array_to_global_array(
            state, mesh, jax.tree.map(lambda _: jax.sharding.PartitionSpec(),
                                      state))
    state, metrics = steps.train_step(state, global_batch_arrays)
    loss = float(metrics["loss"])
    checksum = float(sum(jnp.sum(jnp.abs(p.astype(jnp.float64)))
                         for p in jax.tree.leaves(state.params)))
    return loss, checksum


def main():
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    from vit_unet_tpu.data.loader import DataLoader
    from vit_unet_tpu.parallel.mesh import create_mesh, initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 2 * nprocs, jax.device_count()

    mesh = create_mesh(model_parallel=1)
    loader = DataLoader(synthetic_dataset(), batch_size=4, shuffle=False,
                        num_workers=0, shard_id=proc_id, num_shards=nprocs)
    local_batch = next(iter(loader))

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data"))
    global_batch = {
        k: jax.make_array_from_process_local_data(data_sh, v)
        for k, v in local_batch.items()}
    loss, checksum = run_step(mesh, global_batch)
    print(f"RESULT {proc_id} {loss!r} {checksum!r}", flush=True)


if __name__ == "__main__":
    main()
