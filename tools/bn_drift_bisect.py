"""Bisect the flash exact-BN gradient divergence at the saved state.

Compares gradients at tools/bn_drift_state.pkl (CPU interpret mode, exact
arithmetic) between the XLA path and the flash kernels in BOTH BN modes:

  frozen   flash_frozen_bn=True  (folded-affine kernel, simpler VJP)
  exact    flash train bn kernel (stats + through-the-statistics VJP)

If frozen parity is tight while exact diverges, the bug is in the
``flash_reattention_train_bn`` VJP; if both diverge, it's in the shared
core (dropout/base backward).

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/bn_drift_bisect.py
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bn_probe_drift import compare, grad_fn, make_models  # noqa: E402
from vit_unet_tpu.models.vit_unet import ViTUNet  # noqa: E402


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bn_drift_state.pkl")
    with open(path, "rb") as f:
        st = pickle.load(f)
    params = jax.tree.map(jnp.asarray, st["params"])
    batch_stats = jax.tree.map(jnp.asarray, st["batch_stats"])
    x, y = jnp.asarray(st["x"]), jnp.asarray(st["y"])

    xla_model, flash_model = make_models()
    frozen_flash = ViTUNet(dataclasses.replace(flash_model.config,
                                               flash_frozen_bn=True))
    rng = jax.random.key(9999)

    def bn_frozen_grad(model):
        """Gradient with use_running_average=True (frozen-BN train step)."""
        def f(p):
            out = model.apply({"params": p, "batch_stats": batch_stats}, x,
                              deterministic=False, use_running_average=True,
                              rngs={"dropout": rng})
            return jnp.mean((out - y) ** 2)
        return jax.value_and_grad(f)(params)

    # frozen mode: XLA vs flash
    lx, gx = bn_frozen_grad(xla_model)
    lf, gf = bn_frozen_grad(frozen_flash)
    cos, rel, worst, worst_name = compare(gx, gf)
    print(f"FROZEN: loss xla={float(lx):.6f} flash={float(lf):.6f}")
    print(f"FROZEN: cos={cos:.6f} rel_l2={rel:.6f} worst={worst:.4f} "
          f"({worst_name})")

    # exact mode (as in repro, for reference)
    lx, gx = grad_fn(xla_model)(params, batch_stats, rng, x, y)
    lf, gf = grad_fn(flash_model)(params, batch_stats, rng, x, y)
    cos, rel, worst, worst_name = compare(gx, gf)
    print(f"EXACT:  loss xla={float(lx):.6f} flash={float(lf):.6f}")
    print(f"EXACT:  cos={cos:.6f} rel_l2={rel:.6f} worst={worst:.4f} "
          f"({worst_name})")


if __name__ == "__main__":
    main()
