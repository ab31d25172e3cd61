"""Per-call flash-kernel roofline: structural MXU ceilings vs measured time.

The lite fine level's lane-starvation analysis (docs/PERF.md: dh=12 caps the
score matmul at 12/128 = 9.4% of MXU depth, measured ~9%) covered one call
site.  This tool generalises it to EVERY flash training call of every README
preset (reference workload: the train step the bench times,
ViT_UNet_TF_TPU.ipynb cell 23 protocol):

1. enumerate the calls by tracing the real train step under
   ``jax.eval_shape`` with a recording shim around the kernel entry points
   (no device memory, no compile);
2. compute each call's STRUCTURAL ceiling from its shapes — what fraction of
   MXU issue slots the call can use at best, given (a) contraction depth
   dh < 128 in the score matmul, (b) output lanes dh < 128 in the A·V
   matmul, (c) padding of N to the kernel tile; and the resulting
   floor time at the chip's bf16 peak;
3. time each call standalone on the TPU (forward and forward+backward,
   iterated inside one jit via ``lax.scan`` so the ~27 ms tunnel round-trip
   is paid once, not per iteration);
4. emit JSON rows (tools/roofline.jsonl) and a markdown table for
   docs/PERF.md: ceiling vs achieved, per call site — headroom made
   explicit, or saturation proven.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
      [--presets lite,base,large] [--measure/--no-measure]
"""
from __future__ import annotations

import argparse
import json
import os
import time
from collections import OrderedDict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

BATCH = 64
PEAK_BF16 = 197e12  # TPU v5e bf16 matmul peak, FLOP/s


# ---------------------------------------------------------------------------
# 1. call-site enumeration (abstract trace, no device)
# ---------------------------------------------------------------------------

def collect_calls(preset: str, frozen_bn: bool):
    """Trace one train step of ``preset`` and record every flash training
    kernel call: (mode, B, H, Nq, Nk, dh, block, rate) -> count.

    The recording shims wrap the kernel entry points in
    ``kernels.flash_reattention_train`` (ReAttention imports them at call
    time, so a module-attribute patch intercepts the traced calls) and then
    delegate, so the trace — including the custom-VJP backward — is the real
    program.
    """
    import importlib

    ktrain = importlib.import_module(
        "vit_unet_tpu.kernels.flash_reattention_train")
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    from vit_unet_tpu.parallel.train_step import (TrainState,
                                                  build_step_functions)
    from vit_unet_tpu.train.losses import mse

    calls: OrderedDict = OrderedDict()
    orig_train = ktrain.flash_reattention_train
    orig_bn = ktrain.flash_reattention_train_bn

    def record(mode, q, k, block_q, rate):
        b, h, nq, dh = q.shape
        nk = k.shape[2]
        key = (mode, b, h, nq, nk, dh, block_q, float(rate))
        calls[key] = calls.get(key, 0) + 1

    def shim_train(q, k, v_cat, m_eff, c_eff, seed, num_heads, rate=0.0,
                   block_q=128, block_k=128, interpret=False):
        record("frozen", q, k, block_q, rate)
        return orig_train(q, k, v_cat, m_eff, c_eff, seed, num_heads, rate,
                          block_q, block_k, interpret)

    def shim_bn(q, k, v_cat, conv_m, conv_c, gamma, beta, seed, num_heads,
                rate=0.0, block_q=128, block_k=128, interpret=False,
                eps=1e-5, reatten_scale=1.0, psum_axes=None, cnt=None):
        record("exact", q, k, block_q, rate)
        return orig_bn(q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
                       num_heads, rate, block_q, block_k, interpret, eps,
                       reatten_scale, psum_axes, cnt)

    model = get_vit_unet(preset, dtype="bfloat16", param_dtype="bfloat16",
                         use_flash=True, flash_train=True,
                         flash_frozen_bn=frozen_bn)
    tx = optax.adamw(1e-4)

    def whole(x, y):
        variables = model.init(jax.random.key(0), x[:1])
        state = TrainState.create(params=variables["params"], tx=tx,
                                  batch_stats=variables.get("batch_stats",
                                                            {}),
                                  rng=jax.random.key(1))
        steps = build_step_functions(model, tx, mse, donate=False)
        return steps.train_step(state, {"x": x, "y": y})

    x = jax.ShapeDtypeStruct((BATCH, 3, 224, 224), jnp.float32)
    ktrain.flash_reattention_train = shim_train
    ktrain.flash_reattention_train_bn = shim_bn
    try:
        jax.eval_shape(whole, x, x)
    finally:
        ktrain.flash_reattention_train = orig_train
        ktrain.flash_reattention_train_bn = orig_bn
    return calls


# ---------------------------------------------------------------------------
# 2. structural ceiling
# ---------------------------------------------------------------------------

def ceiling(mode, b, h, nq, nk, dh, block):
    """Structural MXU floor time (ms) for one forward and one backward of
    the call, and the ceiling utilisation fractions it encodes.

    Issue-slot model (v5e, 128x128 MXU): a matmul with contraction depth d
    occupies ceil(d/128)*128 depth-slots per output tile, and an output with
    w lanes occupies ceil(w/128)*128 lane-slots — useful fraction
    d/ceil128(d) * w/ceil128(w).  Token padding to the kernel tile wastes
    the padded fraction of both score-matmul operands.  The floor is
    useful_MACs * 2 / (PEAK * util) summed over the call's matmuls:

    forward:  scores  (Nq~ x dh) @ (dh x Nk~)   depth-bound by dh
              A.V     (Nq~ x Nk~) @ (Nk~ x dh)  lane-bound by dh
              (+ the exact mode's S/C stats sweep is VPU work, costed
               separately in docs/PERF.md — not an MXU term)
    backward: dS two matmuls like scores (dv, recompute) + dq, dk, dv =
              5 score-shaped matmuls total (measured structure of _bwd:
              recompute scores, dv = A^T g', ds@K for dq, ds^T@Q for dk,
              g'@V^T for dp) — 2 depth-bound (scores, dq-from-ds@K lanes=dh
              -> lane-bound, ...).  We count: recompute scores (depth dh),
              dp = g V^T (depth dh), dq = ds K (lanes dh), dk = ds^T Q
              (lanes dh), dv = A^T g (lanes dh): 5 N^2-class matmuls.
    """
    def c128(v):
        return -(-v // 128) * 128

    pq = -(-nq // block) * block
    pk = -(-nk // block) * block
    pad_util = (nq * nk) / (pq * pk)
    depth_util = dh / c128(dh)
    lane_util = dh / c128(dh)

    macs = b * h * nq * nk * dh  # one N^2-class matmul's useful MACs
    # forward: 1 depth-bound + 1 lane-bound
    fwd_s = (macs * 2 / (PEAK_BF16 * depth_util * pad_util)
             + macs * 2 / (PEAK_BF16 * lane_util * pad_util))
    # backward: 2 depth-bound + 3 lane-bound N^2 matmuls
    bwd_s = (2 * macs * 2 / (PEAK_BF16 * depth_util * pad_util)
             + 3 * macs * 2 / (PEAK_BF16 * lane_util * pad_util))
    return {"fwd_floor_ms": fwd_s * 1e3, "bwd_floor_ms": bwd_s * 1e3,
            "depth_util": depth_util, "lane_util": lane_util,
            "pad_util": pad_util,
            "gmacs": macs / 1e9}


# ---------------------------------------------------------------------------
# 3. standalone measurement on the TPU
# ---------------------------------------------------------------------------

def measure(mode, b, h, nq, nk, dh, block, rate, iters=24):
    """Median per-call time (ms): forward alone, and forward+backward via
    jax.grad.  The call is iterated inside one jit with a data dependence
    through the carry (q <- q + eps*out-slice) so XLA cannot hoist or CSE
    it; one scalar D2H syncs the whole window."""
    import importlib

    ktrain = importlib.import_module(
        "vit_unet_tpu.kernels.flash_reattention_train")

    key = jax.random.key(0)
    q = jax.random.normal(key, (b, h, nq, dh), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, nk, dh), jnp.bfloat16)
    v = jax.random.normal(key, (b, nk, h * dh), jnp.bfloat16)
    m = jnp.eye(h, dtype=jnp.bfloat16)
    c = jnp.zeros((h,), jnp.bfloat16)
    gam = jnp.ones((h,), jnp.bfloat16)
    bet = jnp.zeros((h,), jnp.bfloat16)
    seed = jnp.int32(7)

    if mode == "frozen":
        def call(qq):
            return ktrain.flash_reattention_train(
                qq, k, v, m, c, seed, h, rate, block, block)
    else:
        def call(qq):
            out, mu, var = ktrain.flash_reattention_train_bn(
                qq, k, v, m, c, gam, bet, seed, h, rate, block, block)
            return out

    def fwd_loop(qq, n):
        def body(carry, _):
            out = call(carry)
            upd = out.reshape(b, nq, h, dh).transpose(0, 2, 1, 3)
            return carry + jnp.bfloat16(1e-3) * upd, ()
        return jax.lax.scan(body, qq, None, length=n)[0]

    def train_loop(qq, n):
        def body(carry, _):
            g = jax.grad(lambda z: jnp.sum(call(z).astype(jnp.float32)))(
                carry)
            return carry + jnp.bfloat16(1e-3) * g, ()
        return jax.lax.scan(body, qq, None, length=n)[0]

    out = {}
    for name, loop in (("fwd", fwd_loop), ("train", train_loop)):
        fn = jax.jit(loop, static_argnums=1)
        float(fn(q, 2)[0, 0, 0, 0])  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(q, iters)[0, 0, 0, 0])
            reps.append((time.perf_counter() - t0) / iters)
        out[name] = sorted(reps)[1] * 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default="lite,base,large")
    ap.add_argument("--no-measure", action="store_true")
    args = ap.parse_args()

    rows = []
    for preset in args.presets.split(","):
        for frozen in (True, False):
            mode_name = "fast" if frozen else "exact"
            calls = collect_calls(preset, frozen)
            for (mode, b, h, nq, nk, dh, block, rate), count in calls.items():
                row = {"preset": preset, "step_mode": mode_name,
                       "bn": mode, "count": count, "B": b, "H": h,
                       "N": nq, "Nk": nk, "dh": dh, "block": block,
                       "rate": rate}
                row.update(ceiling(mode, b, h, nq, nk, dh, block))
                rows.append(row)

    if not args.no_measure:
        # measure each unique kernel signature once (signatures repeat
        # across presets/levels)
        seen = {}
        for row in rows:
            sig = (row["bn"], row["B"], row["H"], row["N"], row["Nk"],
                   row["dh"], row["block"], row["rate"])
            if sig not in seen:
                print(f"measuring {sig} ...", flush=True)
                seen[sig] = measure(*sig)
            row["meas_fwd_ms"] = round(seen[sig]["fwd"], 3)
            row["meas_train_ms"] = round(seen[sig]["train"], 3)
            floor = row["fwd_floor_ms"] + row["bwd_floor_ms"]
            row["mxu_floor_frac"] = round(floor / row["meas_train_ms"], 3)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.jsonl")
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    # markdown table
    hdr = ("| preset | mode | calls | N | dh | block | depth/lane util "
           "| pad util | floor f+b ms | meas f+b ms | floor/meas |")
    print(hdr)
    print("|" + "---|" * 11)
    for r in rows:
        floor = r["fwd_floor_ms"] + r["bwd_floor_ms"]
        meas = r.get("meas_train_ms")
        print(f"| {r['preset']} | {r['step_mode']} | {r['count']} "
              f"| {r['N']} | {r['dh']} | {r['block']} "
              f"| {r['depth_util']:.2f} | {r['pad_util']:.2f} "
              f"| {floor:.2f} "
              f"| {meas if meas is not None else '-'} "
              f"| {r.get('mxu_floor_frac', '-')} |")
    # per-step structural totals
    for preset in args.presets.split(","):
        for mode_name in ("fast", "exact"):
            sel = [r for r in rows if r["preset"] == preset
                   and r["step_mode"] == mode_name]
            floor = sum((r["fwd_floor_ms"] + r["bwd_floor_ms"]) * r["count"]
                        for r in sel)
            meas = sum(r.get("meas_train_ms", 0) * r["count"] for r in sel)
            print(f"{preset} {mode_name}: structural floor "
                  f"{floor:.1f} ms/step, measured kernels "
                  f"{meas:.1f} ms/step")


if __name__ == "__main__":
    main()
