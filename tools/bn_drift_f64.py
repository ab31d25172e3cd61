"""Is the exact-BN gradient divergence a VJP bug or ill-conditioning?

Computes, at the saved trajectory state (CPU):
  g64   f64 XLA-path gradient (ground truth)
  g32   f32 XLA-path gradient
  gf32  f32 flash-kernel (interpret) gradient

If ||g32 − g64|| ≈ ||gf32 − g64||, the two f32 paths are equally noisy and
the "divergence" is conditioning of the through-the-statistics gradients
(1/σ² ~ 3e4 amplification at this state's near-degenerate attention-map
variances), not a kernel-VJP logic bug.  If gf32 is much farther from g64
than g32 is, the VJP is wrong.

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/bn_drift_f64.py
"""
from __future__ import annotations

import os
import pickle
import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bn_probe_drift import grad_fn, make_models  # noqa: E402


def dist(a, b):
    va = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(a)])
    vb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(b)])
    cos = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-30))
    rel = float(np.linalg.norm(va - vb) / max(np.linalg.norm(vb), 1e-30))
    return cos, rel


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bn_drift_state.pkl")
    with open(path, "rb") as f:
        st = pickle.load(f)

    xla_model, flash_model = make_models()
    rng = jax.random.key(9999)

    def cast(tree, dt):
        return jax.tree.map(lambda a: jnp.asarray(a, dt), tree)

    p64, b64 = cast(st["params"], jnp.float64), cast(st["batch_stats"],
                                                     jnp.float64)
    x64, y64 = jnp.asarray(st["x"], jnp.float64), jnp.asarray(st["y"],
                                                              jnp.float64)
    p32, b32 = cast(st["params"], jnp.float32), cast(st["batch_stats"],
                                                     jnp.float32)
    x32, y32 = x64.astype(jnp.float32), y64.astype(jnp.float32)

    l64, g64 = grad_fn(xla_model)(p64, b64, rng, x64, y64)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bn_drift_g64.pkl"), "wb") as f:
        pickle.dump(jax.device_get(g64), f)
    l32, g32 = grad_fn(xla_model)(p32, b32, rng, x32, y32)
    lf32, gf32 = grad_fn(flash_model)(p32, b32, rng, x32, y32)
    print(f"loss  f64={float(l64):.8f}  xla32={float(l32):.8f}  "
          f"flash32={float(lf32):.8f}")
    for name, g in (("xla32  vs f64", g32), ("flash32 vs f64", gf32)):
        cos, rel = dist(g, g64)
        print(f"{name}: cos={cos:.6f} rel_l2={rel:.6f}")
    cos, rel = dist(gf32, g32)
    print(f"flash32 vs xla32: cos={cos:.6f} rel_l2={rel:.6f}")

    # per-leaf: distance to f64 truth for the previously-worst leaves
    print("\nleaf                                   |g64|      xla32err  "
          "flash32err")
    for (path_, a64), a32, af in zip(
            jax.tree_util.tree_leaves_with_path(g64),
            jax.tree.leaves(g32), jax.tree.leaves(gf32)):
        s = jax.tree_util.keystr(path_)
        if "var_norm" not in s and "qconv2d" not in s:
            continue
        t = np.asarray(a64, np.float64)
        nt = max(np.linalg.norm(t), 1e-30)
        e32 = np.linalg.norm(np.asarray(a32, np.float64) - t) / nt
        ef = np.linalg.norm(np.asarray(af, np.float64) - t) / nt
        print(f"{s[:42]:42s} {nt:9.3g} {e32:9.3g} {ef:9.3g}")


if __name__ == "__main__":
    main()
