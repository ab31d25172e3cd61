"""Differentiable fused flash re-attention — the training-path kernel.

Extends ``flash_reattention`` (see that module for the folded-affine math)
with a custom VJP so the full re-attention contraction
(torch/model.py:150-164) can run in *training* without ever materialising
the (N, N) attention matrix or its dropout mask in HBM.  The XLA autodiff
path stores softmax(B, H, N, N) **and** u32 dropout-mask intermediates as
residuals — ~600 MB per buffer at the base model's bottleneck (B=32, N=784),
the dominant memory+bandwidth cost of a train step (it OOMs under plain
``jax.checkpoint`` because every recomputed mask is live at once).

Semantics of this path vs the reference train step:

* attention dropout runs *inside* the kernel using the TPU PRNG
  (``pltpu.prng_random_bits``) — statistically identical (keep prob,
  1/keep scaling) but a different random stream than flax's threefry;
* the 1x1 head-mix conv + BatchNorm are applied with *frozen* (running)
  statistics, folded to an (H, H) affine ``m_eff`` + bias ``c_eff`` — the
  "frozen-BN re-attention" training mode.  Gradients flow to the conv
  kernel/bias and BN scale/bias through the (differentiable) fold.

The backward exploits the same affinity trick as the forward: every
per-head proj-wide contraction against the *concatenated* V decomposes into
per-head-pair tile products mixed by ``m_eff`` —

    dA_h2 = sum_hp m_eff[hp, h2] * (g_hp @ v_hp^T)      (T_hp, one proj pass)
    dV_hp = (sum_h2 m_eff[hp, h2] * A_h2)^T @ g_hp      (B_hp, one proj pass)
    dm_eff[hp, h2] = sum A_h2 ⊙ T_hp

so the whole backward costs ~4.5x the forward's matmuls with zero N² HBM
traffic.  Three kernels: a D/dm pass and a dq pass over (batch, q-tile)
grids, and a dk/dv pass over (batch, k-tile).

Numerical equivalence (rate=0) against ``jax.grad`` of the XLA reference is
tested in tests/test_kernels_train.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_INV_2_24 = 1.0 / float(1 << 24)


def _dropout_mask(seed_ref, rate: float, bi, h, qi, ki, nq: int, nk: int,
                  num_heads: int, shape):
    """Regenerable dropout keep-mask scale for one (b, h, q-tile, k-tile):
    returns an array of {0, 1/keep} to multiply probabilities with."""
    idx = ((bi * num_heads + h) * nq + qi) * nk + ki
    pltpu.prng_seed(seed_ref[0] + idx)
    # prng_random_bits yields *int32*; a logical (not arithmetic) shift is
    # required, else half the lattice lands negative and the keep rate
    # collapses to max(0, 0.5-rate) (caught by keep-rate stats tests).
    bits = pltpu.prng_random_bits(shape)
    bits24 = jax.lax.shift_right_logical(bits, 8)        # [0, 2^24)
    u = bits24.astype(jnp.float32) * _INV_2_24           # [0, 1)
    keep = u >= rate
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# forward (training): online softmax + in-kernel dropout + LSE residual
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, vsum_ref, m_ref, c_ref,
                o_ref, lse_ref, m_s, l_s, acc_s, *,
                num_heads: int, n_valid: int, block_k: int, rate: float):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    block_q = q_ref.shape[2]
    dh = q_ref.shape[3]
    k_start = ki * block_k
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
    key_mask = col_ids < n_valid

    v = v_ref[0]                                        # (block_k, proj)
    for h in range(num_heads):                          # static, unrolled
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        s = jnp.where(key_mask, s, NEG_INF)

        m_prev = m_s[h]
        l_prev = l_s[h]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        l_s[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_s[h] = m_next
        if rate > 0.0:
            p = p * _dropout_mask(seed_ref, rate, bi, h, qi, ki, nq, nk,
                                  num_heads, (block_q, block_k))
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_s[h] = acc_s[h] * alpha + pv

    @pl.when(ki == nk - 1)
    def _epilogue():
        o_norm = []
        lse_rows = []
        for h2 in range(num_heads):
            l = l_s[h2][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_norm.append(acc_s[h2] * l_inv)            # (bq, proj)
            lse_rows.append(
                (m_s[h2][:, :1] + jnp.log(jnp.maximum(l, 1e-30))).T)
        vs = vsum_ref[0, 0][None, :]                    # (1, proj)
        groups = []
        for hp in range(num_heads):
            sl = slice(hp * dh, (hp + 1) * dh)
            grp = c_ref[hp, 0] * vs[:, sl]
            for h2 in range(num_heads):
                grp = grp + m_ref[hp, h2] * o_norm[h2][:, sl]
            groups.append(grp)
        o_ref[0] = jnp.concatenate(groups, axis=1).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.concatenate(lse_rows, axis=0)  # (H, bq)


# ---------------------------------------------------------------------------
# backward pass 1: D (softmax-dot correction) + dm_eff partials
# ---------------------------------------------------------------------------

def _bwd_d_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, m_ref,
                  d_ref, dm_ref, d_s, dm_s, *,
                  num_heads: int, n_valid: int, block_k: int, rate: float):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        d_s[...] = jnp.zeros_like(d_s)
        dm_s[...] = jnp.zeros_like(dm_s)

    block_q = q_ref.shape[2]
    dh = q_ref.shape[3]
    k_start = ki * block_k
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    row_ids = row_ids + qi * block_q
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
    valid = (row_ids < n_valid) & (col_ids < n_valid)

    g = g_ref[0]                                        # (bq, proj) f32
    v = v_ref[0]                                        # (bk, proj)
    # T_hp = g_hp @ v_hp^T — one proj-wide pass total
    t_tiles = []
    for hp in range(num_heads):
        sl = slice(hp * dh, (hp + 1) * dh)
        t_tiles.append(jax.lax.dot_general(
            g[:, sl], v[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))         # (bq, bk)

    a_tiles = []
    for h2 in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h2], k_ref[0, h2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lse = lse_ref[0, 0, h2][:, None]                # (bq, 1)
        p = jnp.exp(s - lse)
        p = jnp.where(valid, p, 0.0)
        a = p
        if rate > 0.0:
            a = p * _dropout_mask(seed_ref, rate, bi, h2, qi, ki, nq, nk,
                                  num_heads, (block_q, block_k))
        a_tiles.append(a)
        da = jnp.zeros_like(a)
        for hp in range(num_heads):
            da = da + m_ref[hp, h2] * t_tiles[hp]
        # D_h2 += rowsum(dA ⊙ A)
        d_s[h2] = d_s[h2] + jnp.sum(da * a, axis=1, keepdims=True)

    # dm_eff[hp, h2] += <T_hp, A_h2>_F — one (H, bq*bk) x (bq*bk, H) matmul
    t_flat = jnp.concatenate(
        [t.reshape(1, block_q * block_k) for t in t_tiles], axis=0)
    a_flat = jnp.concatenate(
        [a.reshape(1, block_q * block_k) for a in a_tiles], axis=0)
    dm_s[...] = dm_s[...] + jax.lax.dot_general(
        t_flat, a_flat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (H, H)

    @pl.when(ki == nk - 1)
    def _epilogue():
        d_ref[0, 0] = jnp.concatenate(
            [d_s[h][:, :1].T for h in range(num_heads)], axis=0)  # (H, bq)
        dm_ref[0, 0] = dm_s[...]


# ---------------------------------------------------------------------------
# backward pass 2: dq
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_in_ref,
                   m_ref, dq_ref, dq_s, *,
                   num_heads: int, n_valid: int, block_k: int, rate: float):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    block_q = q_ref.shape[2]
    dh = q_ref.shape[3]
    k_start = ki * block_k
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    row_ids = row_ids + qi * block_q
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
    valid = (row_ids < n_valid) & (col_ids < n_valid)

    g = g_ref[0]
    v = v_ref[0]
    t_tiles = []
    for hp in range(num_heads):
        sl = slice(hp * dh, (hp + 1) * dh)
        t_tiles.append(jax.lax.dot_general(
            g[:, sl], v[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))

    for h2 in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h2], k_ref[0, h2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lse = lse_ref[0, 0, h2][:, None]
        p = jnp.exp(s - lse)
        p = jnp.where(valid, p, 0.0)
        da = jnp.zeros_like(p)
        for hp in range(num_heads):
            da = da + m_ref[hp, h2] * t_tiles[hp]
        if rate > 0.0:
            da = da * _dropout_mask(seed_ref, rate, bi, h2, qi, ki, nq, nk,
                                    num_heads, (block_q, block_k))
        d_row = d_in_ref[0, 0, h2][:, None]             # (bq, 1)
        ds = p * (da - d_row)
        dq_s[h2] = dq_s[h2] + jax.lax.dot(
            ds.astype(k_ref.dtype), k_ref[0, h2],
            preferred_element_type=jnp.float32)          # (bq, dh)

    @pl.when(ki == nk - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_s[...].astype(dq_ref.dtype)   # (H, bq, dh)


# ---------------------------------------------------------------------------
# backward pass 3: dk, dv (grid over k-tiles; inner loop over q-tiles)
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_in_ref,
                    m_ref, dk_ref, dv_ref, dk_s, dv_s, *,
                    num_heads: int, n_valid: int, block_q: int, rate: float):
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nk = pl.num_programs(1)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    block_k = k_ref.shape[2]
    dh = k_ref.shape[3]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    row_ids = row_ids + qi * block_q
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    col_ids = col_ids + ki * block_k
    valid = (row_ids < n_valid) & (col_ids < n_valid)

    g = g_ref[0]                                        # (bq, proj)
    v = v_ref[0]                                        # (bk, proj)
    t_tiles = []
    for hp in range(num_heads):
        sl = slice(hp * dh, (hp + 1) * dh)
        t_tiles.append(jax.lax.dot_general(
            g[:, sl], v[:, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))

    a_tiles = []
    for h2 in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h2], k_ref[0, h2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        lse = lse_ref[0, 0, h2][:, None]
        p = jnp.exp(s - lse)
        p = jnp.where(valid, p, 0.0)
        mask = None
        if rate > 0.0:
            mask = _dropout_mask(seed_ref, rate, bi, h2, qi, ki, nq, nk,
                                 num_heads, (block_q, block_k))
        a_tiles.append(p * mask if mask is not None else p)

        da = jnp.zeros_like(p)
        for hp in range(num_heads):
            da = da + m_ref[hp, h2] * t_tiles[hp]
        if mask is not None:
            da = da * mask
        d_row = d_in_ref[0, 0, h2][:, None]
        ds = p * (da - d_row)
        dk_s[h2] = dk_s[h2] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, h2], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, dh)

    # dv_hp = B_hp^T @ g_hp, B_hp = sum_h2 m_eff[hp, h2] * A_h2
    for hp in range(num_heads):
        b_hp = jnp.zeros((block_q, block_k), jnp.float32)
        for h2 in range(num_heads):
            b_hp = b_hp + m_ref[hp, h2] * a_tiles[h2]
        sl = slice(hp * dh, (hp + 1) * dh)
        dv_s[:, sl] = dv_s[:, sl] + jax.lax.dot_general(
            b_hp, g[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, dh)

    @pl.when(qi == nq - 1)
    def _epilogue():
        dk_ref[0, 0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pad_inputs(q, k, v_cat, block_q, block_k):
    n = q.shape[2]
    n_pad = -n % math.lcm(block_q, block_k)
    if n_pad:
        pad4 = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v_cat = jnp.pad(v_cat, ((0, 0), (0, n_pad), (0, 0)))
    return q, k, v_cat, n + n_pad


def _fwd(q, k, v_cat, m_eff, c_eff, seed, *, num_heads, rate,
         block_q, block_k, interpret):
    batch, heads, n, dh = q.shape
    proj = v_cat.shape[-1]
    q, k, v_cat, np_ = _pad_inputs(q, k, v_cat, block_q, block_k)
    vsum = jnp.sum(v_cat.astype(jnp.float32), axis=1, keepdims=True)
    grid = (batch, np_ // block_q, np_ // block_k)
    nq = np_ // block_q

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, n_valid=n,
                          block_k=block_k, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((batch, np_, proj), q.dtype),
            jax.ShapeDtypeStruct((batch, nq, heads, block_q), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, heads, block_q, dh),
                             lambda bi, qi, ki, *_: (bi, 0, qi, 0)),
                pl.BlockSpec((1, heads, block_k, dh),
                             lambda bi, qi, ki, *_: (bi, 0, ki, 0)),
                pl.BlockSpec((1, block_k, proj),
                             lambda bi, qi, ki, *_: (bi, ki, 0)),
                pl.BlockSpec((1, 1, proj), lambda bi, qi, ki, *_: (bi, 0, 0)),
                pl.BlockSpec((num_heads, num_heads),
                             lambda bi, qi, ki, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((num_heads, 1), lambda bi, qi, ki, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, proj),
                             lambda bi, qi, ki, *_: (bi, qi, 0)),
                pl.BlockSpec((1, 1, num_heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
                pltpu.VMEM((num_heads, block_q, proj), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), q, k, v_cat, vsum,
      m_eff.astype(jnp.float32), c_eff.reshape(num_heads, 1).astype(jnp.float32))
    # lse back to (B, H, np_)
    lse = lse.transpose(0, 2, 1, 3).reshape(batch, heads, np_)
    return out[:, :n, :], lse, vsum[:, 0, :]


def _bwd(q, k, v_cat, m_eff, seed, lse, g, *, num_heads, rate,
         block_q, block_k, interpret):
    batch, heads, n, dh = q.shape
    proj = v_cat.shape[-1]
    q, k, v_cat, np_ = _pad_inputs(q, k, v_cat, block_q, block_k)
    g = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, 0)))
    nq, nk = np_ // block_q, np_ // block_k
    lse_blocked = lse.reshape(batch, heads, nq, block_q).transpose(0, 2, 1, 3)
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    m32 = m_eff.astype(jnp.float32)

    common_in = [
        pl.BlockSpec((1, heads, block_q, dh), lambda bi, qi, ki, *_: (bi, 0, qi, 0)),
        pl.BlockSpec((1, heads, block_k, dh), lambda bi, qi, ki, *_: (bi, 0, ki, 0)),
        pl.BlockSpec((1, block_k, proj), lambda bi, qi, ki, *_: (bi, ki, 0)),
        pl.BlockSpec((1, block_q, proj), lambda bi, qi, ki, *_: (bi, qi, 0)),
        pl.BlockSpec((1, 1, num_heads, block_q),
                     lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
    ]
    m_spec = pl.BlockSpec((num_heads, num_heads), lambda *a, **_: (0, 0),
                          memory_space=pltpu.SMEM)

    # pass 1: D + dm_eff partials
    d_arr, dm_part = pl.pallas_call(
        functools.partial(_bwd_d_kernel, num_heads=num_heads, n_valid=n,
                          block_k=block_k, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((batch, nq, heads, block_q), jnp.float32),
            jax.ShapeDtypeStruct((batch, nq, heads, heads), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, nq, nk),
            in_specs=common_in + [m_spec],
            out_specs=(
                pl.BlockSpec((1, 1, num_heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
                pl.BlockSpec((1, 1, num_heads, num_heads),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
                pltpu.VMEM((num_heads, num_heads), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, q, k, v_cat, g, lse_blocked, m32)
    dm_eff = jnp.sum(dm_part, axis=(0, 1))              # (H, H)

    # pass 2: dq
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_heads=num_heads, n_valid=n,
                          block_k=block_k, rate=rate),
        out_shape=jax.ShapeDtypeStruct((batch, nq, heads, block_q, dh),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, nq, nk),
            in_specs=common_in + [
                pl.BlockSpec((1, 1, num_heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
                m_spec,
            ],
            out_specs=pl.BlockSpec((1, 1, num_heads, block_q, dh),
                                   lambda bi, qi, ki, *_: (bi, qi, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, dh), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, q, k, v_cat, g, lse_blocked, d_arr, m32)
    dq = dq.transpose(0, 2, 1, 3, 4).reshape(batch, heads, np_, dh)[:, :, :n]

    # pass 3: dk + dv — grid over k tiles, loop over q tiles
    dkv_in = [
        pl.BlockSpec((1, heads, block_q, dh), lambda bi, ki, qi, *_: (bi, 0, qi, 0)),
        pl.BlockSpec((1, heads, block_k, dh), lambda bi, ki, qi, *_: (bi, 0, ki, 0)),
        pl.BlockSpec((1, block_k, proj), lambda bi, ki, qi, *_: (bi, ki, 0)),
        pl.BlockSpec((1, block_q, proj), lambda bi, ki, qi, *_: (bi, qi, 0)),
        pl.BlockSpec((1, 1, num_heads, block_q),
                     lambda bi, ki, qi, *_: (bi, qi, 0, 0)),
        pl.BlockSpec((1, 1, num_heads, block_q),
                     lambda bi, ki, qi, *_: (bi, qi, 0, 0)),
        m_spec,
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_heads=num_heads, n_valid=n,
                          block_q=block_q, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((batch, nk, heads, block_k, dh), jnp.float32),
            jax.ShapeDtypeStruct((batch, np_, proj), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, nk, nq),
            in_specs=dkv_in,
            out_specs=(
                pl.BlockSpec((1, 1, num_heads, block_k, dh),
                             lambda bi, ki, qi, *_: (bi, ki, 0, 0, 0)),
                pl.BlockSpec((1, block_k, proj),
                             lambda bi, ki, qi, *_: (bi, ki, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_k, dh), jnp.float32),
                pltpu.VMEM((block_k, proj), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(seed_arr, q, k, v_cat, g, lse_blocked, d_arr, m32)
    dk = dk.transpose(0, 2, 1, 3, 4).reshape(batch, heads, np_, dh)[:, :, :n]
    dv = dv[:, :n, :]
    return dq, dk, dv, dm_eff


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_reattention_train(q, k, v_cat, m_eff, c_eff, seed,
                            num_heads, rate=0.0, block_q=128, block_k=128,
                            interpret=False):
    """Training-path fused re-attention with dropout + custom VJP.

    q, k: (B, H, N, dh), q pre-scaled; v_cat: (B, N, H*dh);
    m_eff: (H, H) head-mix affine (``fold_reattention_compact``);
    c_eff: (H,) bias; seed: int32 scalar for the in-kernel dropout PRNG.
    Returns (B, N, H*dh).
    """
    out, _, _ = _fwd(q, k, v_cat, m_eff, c_eff, seed, num_heads=num_heads,
                     rate=rate, block_q=block_q, block_k=block_k,
                     interpret=interpret)
    return out


def _vjp_fwd(q, k, v_cat, m_eff, c_eff, seed,
             num_heads, rate, block_q, block_k, interpret):
    out, lse, vsum = _fwd(q, k, v_cat, m_eff, c_eff, seed,
                          num_heads=num_heads, rate=rate, block_q=block_q,
                          block_k=block_k, interpret=interpret)
    return out, (q, k, v_cat, m_eff, c_eff, seed, lse, vsum)


def _vjp_bwd(num_heads, rate, block_q, block_k, interpret, res, g):
    q, k, v_cat, m_eff, c_eff, seed, lse, vsum = res
    dh = q.shape[-1]
    dq, dk, dv, dm_eff = _bwd(q, k, v_cat, m_eff, seed, lse, g,
                              num_heads=num_heads, rate=rate,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret)
    g32 = g.astype(jnp.float32)
    # bias term: out += c_eff[head_of(p)] * vsum  (vsum = sum_m v_cat[m])
    gsum = jnp.sum(g32, axis=1)                          # (B, proj)
    dc_eff = jnp.sum(
        (gsum * vsum.astype(jnp.float32)).reshape(
            g.shape[0], num_heads, dh), axis=(0, 2))     # (H,)
    c_rep = jnp.repeat(c_eff.astype(jnp.float32), dh)    # (proj,)
    dv = dv + (c_rep[None, :] * gsum)[:, None, :]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v_cat.dtype),
            dm_eff.astype(m_eff.dtype), dc_eff.astype(c_eff.dtype), None)


flash_reattention_train.defvjp(_vjp_fwd, _vjp_bwd)
