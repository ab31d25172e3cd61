"""TPU-compiled gradient error vs the f64 ground truth at the saved state.

Completes the conditioning analysis (tools/bn_drift_f64.py): how much
accuracy does each path lose when compiled for the TPU (MXU matmul passes,
Mosaic lowering) relative to its CPU-f32 self?

Run (after bn_drift_f64.py wrote bn_drift_g64.pkl):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bn_drift_tpu.py
"""
from __future__ import annotations

import os
import pickle
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.bn_probe_drift import grad_fn, make_models  # noqa: E402


def rel_to(g, g64):
    va = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(g)])
    vb = np.concatenate([np.asarray(x, np.float64).ravel()
                         for x in jax.tree.leaves(g64)])
    return float(np.linalg.norm(va - vb) / max(np.linalg.norm(vb), 1e-30))


def main():
    d = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(d, "bn_drift_state.pkl"), "rb") as f:
        st = pickle.load(f)
    with open(os.path.join(d, "bn_drift_g64.pkl"), "rb") as f:
        g64 = pickle.load(f)
    params = jax.tree.map(jnp.asarray, st["params"])
    batch_stats = jax.tree.map(jnp.asarray, st["batch_stats"])
    x, y = jnp.asarray(st["x"]), jnp.asarray(st["y"])

    xla_model, flash_model = make_models()
    rng = jax.random.key(9999)
    lx, gx = grad_fn(xla_model)(params, batch_stats, rng, x, y)
    lf, gf = grad_fn(flash_model)(params, batch_stats, rng, x, y)
    print(f"loss xla={float(lx):.8f} flash={float(lf):.8f}")
    print(f"TPU xla32   vs f64: rel_l2={rel_to(gx, g64):.6f}")
    print(f"TPU flash32 vs f64: rel_l2={rel_to(gf, g64):.6f}")


if __name__ == "__main__":
    main()
