"""Offline repro of the flash exact-BN gradient divergence (CPU, exact).

Loads the trajectory state saved by ``bn_probe_drift.py --save-at`` and
compares full-model gradients: XLA path vs flash train kernels in
*interpret mode* (CPU, numerically exact to ~1e-5).  If interpret-mode
gradients also diverge at this state, the custom-VJP math is wrong in this
regime (a logic bug); if they match, the TPU-compiled kernel's arithmetic
(precision or Mosaic lowering) is the cause.

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/bn_drift_repro.py
"""
from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bn_probe_drift import compare, grad_fn, make_models  # noqa: E402


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bn_drift_state.pkl")
    with open(path, "rb") as f:
        st = pickle.load(f)
    params = jax.tree.map(jnp.asarray, st["params"])
    batch_stats = jax.tree.map(jnp.asarray, st["batch_stats"])
    x, y = jnp.asarray(st["x"]), jnp.asarray(st["y"])
    print(f"state from step {st['step']}, batch {x.shape}")

    xla_model, flash_model = make_models()
    rng = jax.random.key(9999)
    lx, gx = grad_fn(xla_model)(params, batch_stats, rng, x, y)
    lf, gf = grad_fn(flash_model)(params, batch_stats, rng, x, y)
    cos, rel, worst, worst_name = compare(gx, gf)
    print(f"loss xla={float(lx):.6f} flash={float(lf):.6f} "
          f"rel_gap={abs(float(lx)-float(lf))/abs(float(lx)):.2e}")
    print(f"grad cos={cos:.6f} rel_l2={rel:.6f} worst_leaf_rel={worst:.3f} "
          f"({worst_name})")
    # top-10 worst leaves with magnitudes, to localize
    rows = []
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(gx),
                         jax.tree.leaves(gf)):
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        na = np.linalg.norm(a64)
        rows.append((float(np.linalg.norm(a64 - b64) / max(na, 1e-30)),
                     float(na), float(np.linalg.norm(b64)),
                     jax.tree_util.keystr(p)))
    rows.sort(reverse=True)
    print("\nworst leaves (rel_err, |g_xla|, |g_flash|, leaf):")
    for r in rows[:10]:
        print(f"  {r[0]:12.4f}  {r[1]:12.5g}  {r[2]:12.5g}  {r[3]}")


if __name__ == "__main__":
    main()
