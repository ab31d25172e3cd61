"""Microbenchmark flash kernel tile shapes on the real TPU.

Times chained repeats (sequentially dependent inside one jit) of the
training fwd+bwd (and optionally the exact-BN variant) for a given
attention shape and a list of (block_q, block_k) candidates.  Usage:

    python tools/tile_bench.py base          # base bottleneck sweep
    python tools/tile_bench.py lite          # lite fine-level sweep
    python tools/tile_bench.py '{"B":64,...}'

Results append to tools/tile_bench.jsonl.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from vit_unet_tpu.kernels.flash_reattention_train import (  # noqa: E402
    flash_reattention_train, flash_reattention_train_bn)

R = 6          # chained repeats inside one jit
REPS = 4       # timed outer reps (median)

SWEEPS = {
    "base": dict(B=64, H=8, N=784, dh=24, rate=0.2,
                 tiles=[(512, 512), (896, 128), (448, 128), (896, 896),
                        (128, 128)]),
    "lite": dict(B=64, H=4, N=3136, dh=12, rate=0.2,
                 tiles=[(512, 512), (640, 640), (1600, 640), (640, 128),
                        (1600, 128)]),
    "litemid": dict(B=64, H=4, N=784, dh=48, rate=0.2,
                    tiles=[(128, 128), (448, 128), (896, 128), (896, 896)]),
    "mid": dict(B=64, H=8, N=196, dh=96, rate=0.2,
                tiles=[(128, 128), (256, 128), (256, 256)]),
}


def bench_one(B, H, N, dh, rate, bq, bk, mode):
    proj = H * dh
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, H, N, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, N, proj), jnp.bfloat16)
    w0 = jax.random.normal(ks[3], (B, N, proj), jnp.bfloat16)
    m_eff = jax.random.normal(ks[4], (H, H), jnp.float32) * 0.3
    c_eff = jax.random.normal(ks[5], (H,), jnp.float32) * 0.01
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)

    if mode == "train":
        def loss(qx):
            out = flash_reattention_train(qx, k, v, m_eff, c_eff, 7,
                                          H, rate, bq, bk, False)
            return jnp.sum(out.astype(jnp.float32) * w0.astype(jnp.float32))
    else:
        conv_m = m_eff
        conv_c = c_eff

        def loss(qx):
            out, mu, var = flash_reattention_train_bn(
                qx, k, v, conv_m, conv_c, gamma, beta, 7,
                H, rate, bq, bk, False, 1e-5, 1.0)
            return (jnp.sum(out.astype(jnp.float32) * w0.astype(jnp.float32))
                    + jnp.sum(mu) + jnp.sum(var))

    @jax.jit
    def chained(qx):
        def body(carry, _):
            l, dq = jax.value_and_grad(loss)(carry)
            return (carry + 1e-6 * dq.astype(carry.dtype)), l
        qf, ls = jax.lax.scan(body, qx, None, length=R)
        return jnp.sum(ls) + jnp.sum(qf.astype(jnp.float32))

    try:
        float(chained(q))  # compile + run once
    except Exception as e:  # Mosaic compile failure etc.
        return {"error": str(e)[:200]}
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(chained(q))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    return {"ms_per_call": 1e3 * med / R, "total_s": med}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    modes = sys.argv[2].split(",") if len(sys.argv) > 2 else ["train", "bn"]
    cfg = SWEEPS[name] if name in SWEEPS else json.loads(name)
    tiles = cfg.pop("tiles")
    print(f"device: {jax.devices()[0]}  cfg={cfg}")
    with open("/root/repo/tools/tile_bench.jsonl", "a") as f:
        for mode in modes:
            for bq, bk in tiles:
                r = bench_one(**cfg, bq=bq, bk=bk, mode=mode)
                rec = {"sweep": name, "mode": mode, "bq": bq, "bk": bk,
                       **cfg, **r}
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
