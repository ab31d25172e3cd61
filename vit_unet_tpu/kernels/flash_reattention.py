"""Fused flash re-attention — the framework's headline Pallas kernel.

Computes the full re-attention contraction of ``ReAttention``
(torch/model.py:150-164) without materialising the (N, N) attention matrix:

    attn_h  = softmax(q_h @ k_h^T * scale)                 (per head)
    attn'_h = sum_h2 M[h, h2] * attn_h2 + c[h]             (1x1 conv across
                                                            heads + BatchNorm
                                                            eval affine,
                                                            folded into M, c)
    out_h   = attn'_h @ v_h

The XLA path writes softmax(B, H, N, N) to HBM (157 MB *per image* at the
lite model's finest level, N=3136) and reads it back twice (conv + BN + @V).
Here everything stays in VMEM tiles with online softmax.

The trick that makes the head-mix fusable: it is affine in the *normalised*
attention probabilities and the normaliser l_h2 is per (head, row), so

    out[:, p] = sum_h2 W[h2, p] * (T_h2[:, p] / l_h2) + b[p] * vsum[p]
    with  T_h2 = exp(s_h2 - m_h2) @ V_cat     (V_cat = heads concatenated)
          W[h2, p] = M[head_of(p), h2],  b[p] = c[head_of(p)]

i.e. per-KV-tile we accumulate H cross products ``p_h2 @ V_cat`` (wide,
MXU-friendly matmuls over the full projection dim instead of a thin per-head
d_h) and the head-mix collapses to an elementwise multiply-add epilogue —
no lane-unaligned head slicing inside the kernel.

Used for deterministic (eval/serving) paths, including rectangular
sequence-parallel shards (n_q != n_k); training runs the sibling kernels in
``flash_reattention_train.py`` (custom VJPs, in-kernel dropout, frozen or
exact batch-stats BatchNorm — no materialised map there either).
Numerical equivalence vs the XLA path is tested in tests/test_kernels.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _chunk_sum(p):
    """(bq, bk) -> (bq, min(128, bk)) per-lane partial sums (full row sums
    deferred to the epilogue; see flash_reattention_train._chunk_sum)."""
    w = min(128, p.shape[1])
    out = p[:, :w]
    for j in range(1, p.shape[1] // w):
        out = out + p[:, j * w:(j + 1) * w]
    return out


def _kernel(q_ref, k_ref, v_ref, vsum_ref, w_ref, b_ref, o_ref,
            m_s, l_s, acc_s, *, num_heads: int, n_valid: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    block_q = q_ref.shape[2]
    k_start = ki * block_k
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
    key_mask = col_ids < n_valid

    v = v_ref[0]                                   # (block_k, proj)
    for h in range(num_heads):                     # static, unrolled
        qh = q_ref[0, h]                           # (block_q, dh) — pre-scaled
        kh = k_ref[0, h]                           # (block_k, dh)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (block_q, block_k)
        s = jnp.where(key_mask, s, NEG_INF)

        m_prev = m_s[h]                            # (block_q, 128)
        l_prev = l_s[h]
        m_curr = jnp.max(s, axis=1, keepdims=True)          # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)                # (block_q, 128)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])      # (block_q, 1)
        p = jnp.exp(s - m_next[:, :1])                      # (block_q, block_k)
        # l as 128-lane partial sums: the online rescale commutes with
        # per-lane partials, so the cross-lane reduction happens once per
        # row-block in the epilogue instead of once per k-step
        l_s[h] = alpha * l_prev + _chunk_sum(p)
        m_s[h] = m_next
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)  # (bq, proj)
        acc_s[h] = acc_s[h] * alpha + pv

    @pl.when(ki == nk - 1)
    def _epilogue():
        out = b_ref[0][None, :] * vsum_ref[0, 0][None, :]
        for h2 in range(num_heads):
            l = jnp.sum(l_s[h2], axis=1, keepdims=True)
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            out = out + w_ref[h2][None, :] * (acc_s[h2] * l_inv)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_k", "interpret"))
def flash_reattention(
    q: jnp.ndarray,          # (B, H, N, dh) — already scaled by qk_scale
    k: jnp.ndarray,          # (B, H, N, dh)
    v_cat: jnp.ndarray,      # (B, N, H*dh)  heads concatenated (token layout)
    w: jnp.ndarray,          # (H, H*dh)  W[h2, p] = M[head_of(p), h2]
    b: jnp.ndarray,          # (H*dh,)    b[p] = c[head_of(p)]
    *,
    num_heads: int,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, N_q, H*dh) — the merged-head re-attention output.

    ``q`` may have a different token count than ``k``/``v_cat`` (rectangular
    attention) — the sequence-parallel composition attends each chip's local
    query rows against the all-gathered keys/values (parallel/sequence.py).
    """
    batch, heads, n_q, dh = q.shape
    n = k.shape[2]
    proj = v_cat.shape[-1]
    assert heads == num_heads and proj == heads * dh
    assert v_cat.shape[1] == n

    q_pad = -n_q % block_q
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    k_pad = -n % block_k
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v_cat = jnp.pad(v_cat, ((0, 0), (0, k_pad), (0, 0)))
    nq_, nk_ = n_q + q_pad, n + k_pad

    vsum = jnp.sum(v_cat.astype(jnp.float32), axis=1, keepdims=True)  # (B,1,proj)

    grid = (batch, nq_ // block_q, nk_ // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, n_valid=n,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((batch, nq_, proj), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, heads, block_q, dh),
                             lambda bi, qi, ki: (bi, 0, qi, 0)),
                pl.BlockSpec((1, heads, block_k, dh),
                             lambda bi, qi, ki: (bi, 0, ki, 0)),
                pl.BlockSpec((1, block_k, proj),
                             lambda bi, qi, ki: (bi, ki, 0)),
                pl.BlockSpec((1, 1, proj), lambda bi, qi, ki: (bi, 0, 0)),
                pl.BlockSpec((num_heads, proj), lambda bi, qi, ki: (0, 0)),
                pl.BlockSpec((1, proj), lambda bi, qi, ki: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, proj),
                                   lambda bi, qi, ki: (bi, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),   # m
                pltpu.VMEM((num_heads, block_q, min(128, block_k)),
                           jnp.float32),                              # l
                pltpu.VMEM((num_heads, block_q, proj), jnp.float32),  # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB physical VMEM; the 16 MiB default scoped budget
            # rejects wide-proj blocks (o_norm residual) that fit comfortably
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v_cat, vsum, w.astype(jnp.float32),
      b.reshape(1, proj).astype(jnp.float32))
    return out[:, :n_q, :]


def pick_flash_block(n_q: int, n_k: int | None = None, *,
                     num_heads: int, dh: int, bn: bool = False,
                     train: bool = False) -> int:
    """Sweep-measured kernel tile size for a (possibly rectangular)
    re-attention call — the single source of truth behind
    ``ReAttention._flash_block`` (square case) and the sequence-parallel
    per-shard call (local query rows vs gathered keys: ``n_q != n_k``).

    Derivation: the round-3 TPU tile sweeps (tools/tile_bench.jsonl,
    docs/PERF.md) — 512 tiles for thin heads (dh <= 48), 512-vs-640 chosen
    by padded-token waste at long fine levels, 256 at mid levels
    (dh <= 96) and wide single-k-tile levels, 64 only for wide-proj
    multi-tile grids.  Rectangular shapes generalise the waste rule to the
    padded q x k score AREA (the kernels pad each axis to its own tile
    multiple); for n_q == n_k it reduces exactly to the square rule.

    ``train``/``bn``: the round-5 single-tile-896 bottleneck rule applies
    ONLY to the frozen training kernel (fwd+bwd — the backward's single k
    sweep is where it wins; measured −15%).  The eval kernel is ~20%
    SLOWER at 896 than 512 at the same shape, and the exact batch-stats
    kernel (larger S/C stats accumulators) still Mosaic-crashes there —
    both keep the r3 envelope.
    """
    n_k = n_q if n_k is None else n_k
    dim = num_heads * dh
    n_max = max(n_q, n_k)

    def padded(n: int, b: int) -> int:
        return -(-n // b) * b

    if dh > 192:
        return 256 if n_max <= 256 else 64
    if (dh <= 32 and num_heads <= 4 and dim <= 256
            and min(n_q, n_k) >= 512):
        # long fine levels: minimise padded score area between 2x tiles
        return min((512, 640),
                   key=lambda b: (padded(n_q, b) * padded(n_k, b), b))
    if (train and not bn and dh <= 24 and num_heads <= 8
            and 512 < min(n_q, n_k) and n_max <= 896):
        # round-5 (fused-ghat backward) re-sweep: the bottleneck class
        # (H8, dh24, N784) now compiles AND wins at a SINGLE 896 tile —
        # 13.6 vs 16.1 ms/call against the 512 grid (the whole online-
        # softmax multi-tile machinery collapses to one pass; the r3
        # "Mosaic-crashes at 896" belonged to the pre-fused backward's
        # f32 tile mixes).  Exact-BN (bn=True) still crashes there.
        return 896
    if dh <= 48 and num_heads <= 8 and min(n_q, n_k) >= 512:
        return 512
    if num_heads <= 8 and n_max > 128 and (dh <= 96 or n_max <= 256):
        # 256 tolerates moderate extra padding (measured: N=784/dh48
        # prefers 256's 1024-pad over 128's 896-pad) but not the
        # short-sequence worst cases (e.g. N=320: 512-pad vs 384-pad)
        if (-n_max % 256) - (-n_max % 128) <= n_max // 4:
            return 256
    return 128


def fold_reattention_compact(conv_kernel, conv_bias, bn_scale, bn_bias,
                             bn_mean, bn_var, *, eps: float = 1e-5,
                             reatten_scale: float = 1.0):
    """Fold the 1x1 head-mix conv + BatchNorm (eval) into the compact
    (H, H) affine ``m_eff`` + (H,) bias ``c_eff``:
    attn'_h = sum_h2 m_eff[h, h2] * attn_h2 + c_eff[h].

    conv_kernel: (1, 1, H, H) flax layout (in=h2, out=h) or (H, H) [h, h2].
    Differentiable — gradients flow back to the conv/BN params.
    """
    ck = jnp.asarray(conv_kernel)
    if ck.ndim == 4:                     # flax conv kernel (1, 1, in, out)
        m = ck[0, 0].T                   # -> (out=h, in=h2)
    else:
        m = ck
    a = bn_scale / jnp.sqrt(bn_var + eps)
    c = (bn_bias - a * bn_mean) + a * jnp.asarray(conv_bias)
    m_eff = (a[:, None] * m) * reatten_scale          # (h, h2)
    c_eff = c * reatten_scale                          # (h,)
    return m_eff, c_eff


def expand_reattention_affine(m_eff, c_eff, *, dh: int):
    """Expand the compact (H, H)/(H,) affine to the kernel-epilogue layout:
    w (H, H*dh) with w[h2, p] = m_eff[head_of(p), h2];
    b (H*dh,) = c_eff[head_of(p)]."""
    w = jnp.repeat(m_eff.T, dh, axis=1)                # (h2, H*dh)
    b = jnp.repeat(c_eff, dh)                          # (H*dh,)
    return w, b


def fold_reattention_affine(conv_kernel, conv_bias, bn_scale, bn_bias,
                            bn_mean, bn_var, *, eps: float = 1e-5,
                            reatten_scale: float = 1.0, dh: int):
    """``fold_reattention_compact`` + ``expand_reattention_affine``."""
    m_eff, c_eff = fold_reattention_compact(
        conv_kernel, conv_bias, bn_scale, bn_bias, bn_mean, bn_var,
        eps=eps, reatten_scale=reatten_scale)
    return expand_reattention_affine(m_eff, c_eff, dh=dh)
