"""Inference (eval-forward) throughput for the README presets.

PERF.md's eval rows predate the round-2/3 kernel work (f32 params,
batch 32, round-1 tiles); serving is a first-class target, so measure the
current eval path: bf16 params/compute, fused flash re-attention with the
folded running-stats affine (kernels/flash_reattention.py), the
sweep-driven tile envelope, and the coarse-level fused QKV.

Methodology matches bench.py: a scalar D2H per step is the sync barrier
(block_until_ready is unreliable over the tunnel backend), median of the
timed iterations.  The XLA comparison rows materialise the (N, N) maps, so
lite (N=3136: 9.4 GB per bottleneck map at batch 64) only fits at a small
batch — reported at the largest that compiles.

Usage: python tools/infer_bench.py [batch ...]   (default 64)
"""
from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def build(name: str, use_flash: bool):
    from vit_unet_tpu.models.vit_unet import get_vit_unet

    model = get_vit_unet(name, dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=use_flash)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 224, 224)))

    @jax.jit
    def fwd(variables, x):
        out = model.apply(variables, x, deterministic=True,
                          use_running_average=True)
        # scalar probe for the D2H sync barrier (fused into the step)
        return out, jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))

    return fwd, variables


def measure(fwd, variables, batch: int, iters: int = 20) -> float:
    x = jax.random.normal(jax.random.key(2), (batch, 3, 224, 224),
                          jnp.float32)
    for _ in range(3):
        _, probe = fwd(variables, x)
        float(probe)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _, probe = fwd(variables, x)
        float(probe)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch / dt


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64]
    for name in ("lite", "base", "large"):
        for use_flash in (True, False):
            fwd, variables = build(name, use_flash)
            for batch in batches if use_flash else [8]:
                try:
                    thr = measure(fwd, variables, batch)
                except Exception as e:
                    print(f"{name} {'flash' if use_flash else 'xla  '} "
                          f"b{batch}: failed ({type(e).__name__}: "
                          f"{str(e)[:120]})", flush=True)
                    continue
                print(f"{name} {'flash' if use_flash else 'xla  '} "
                      f"b{batch}: {thr:7.1f} img/s "
                      f"({batch / thr * 1e3:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
