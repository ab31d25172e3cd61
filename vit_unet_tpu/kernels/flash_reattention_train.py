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

ONE kernel pass over a (batch, k-tile, q-tile) grid computes dk and dv
(accumulated in scratch) plus per-k-tile dq partials (a thin HBM tensor
summed over k tiles in XLA) — every (q, k) tile's scores/probabilities/
dropout mask are recomputed exactly once in the whole backward, vs 3x in
the original 3-pass design.  The softmax-dot correction D and dm_eff need
no kernel at all: the forward saves the per-head normalised accumulator
``o_norm_h2 = A_h2 @ V_cat`` as a residual, and

    R[b,h2,n,hp] = Σ_d g_hp[n,d]·o_norm_h2[n, hp·dh+d] = Σ_m A_h2 ⊙ T_hp
    D = Σ_hp m_eff[hp,·]·R,   dm_eff = Σ_{b,n} R

— one cheap XLA einsum.  Residuals are (q, k, v, LSE, o_norm); no N² HBM
traffic anywhere (the dq-partials tensor is N·nk·dh per head, not N²).

Numerical equivalence (rate=0) against ``jax.grad`` of the XLA reference is
tested in tests/test_kernels_train.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_INV_2_24 = 1.0 / float(1 << 24)


def _lane_chunk(block_k: int) -> int:
    """Lane width of deferred row-sum accumulators (see ``_chunk_sum``)."""
    return min(128, block_k)


def _chunk_sum(p):
    """(bq, bk) -> (bq, min(128, bk)) per-lane partial sums.

    Row sums inside the k-loop (softmax normaliser l, the BN stats S/C)
    don't need their final (bq, 1) shape until the epilogue: the online
    rescale ``acc = alpha * acc + new`` commutes with per-lane partials.
    Accumulating 128-lane chunks turns one full cross-lane reduction per
    quantity per k-step (the dominant VPU cost of the stats sweep) into
    cheap lane-aligned adds, with a single real reduction per row-block."""
    w = _lane_chunk(p.shape[1])
    out = p[:, :w]
    for j in range(1, p.shape[1] // w):
        out = out + p[:, j * w:(j + 1) * w]
    return out


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
    # integer threshold, bit-identical to the float compare it replaces:
    # bits24 * 2^-24 is exact in f32 (<= 24 significant bits, power-of-two
    # scale), so  u >= f32(rate)  <=>  bits24 >= ceil(f32(rate) * 2^24) —
    # the int compare saves the convert+multiply VPU ops per score element
    thr = int(math.ceil(float(np.float32(rate)) * float(1 << 24)))
    keep = bits24 >= thr
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# forward (training): online softmax + in-kernel dropout + LSE residual
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, vsum_ref, m_ref, c_ref,
                o_ref, lse_ref, onorm_ref, m_s, l_s, acc_s, *,
                num_heads: int, n_valid: int, block_k: int, rate: float):
    # n_valid masks the KEY axis only (rectangular calls have fewer query
    # rows; padded query rows produce garbage that the wrapper slices off
    # and the backward zeroes via the zero-padded cotangent)
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
        l_s[h] = alpha * l_prev + _chunk_sum(p)   # lane partials; reduced once
        m_s[h] = m_next                           # per row-block in _epilogue
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
            l = jnp.sum(l_s[h2], axis=1, keepdims=True)
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_norm.append(acc_s[h2] * l_inv)            # (bq, proj)
            # residual for the backward: A_h2 @ V_cat, normalised (and
            # dropout-masked) — lets D and dm_eff come from one XLA einsum
            # instead of a third QK-recompute kernel pass
            onorm_ref[0, 0, h2] = o_norm[h2].astype(onorm_ref.dtype)
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
# backward: ONE kernel pass over (batch, k-tile, q-tile) computing dk, dv
# and per-k-tile dq partials (summed over k tiles in XLA).  D and dm_eff
# need no kernel pass at all — they fall out of the o_norm forward residual
# in XLA (see _bwd) — so each (q, k) tile's scores/probabilities are
# recomputed exactly once in the whole backward.
# ---------------------------------------------------------------------------

def _fused_ghat(num_heads: int, dh: int) -> bool:
    """Backward dA/dV formulation choice, by shape (static).

    The head-mix affinity gives two exact formulations of the same sums:

    legacy:  T_hp = g_hp @ v_hp^T (H depth-dh f32 matmuls), then
             dA_h2 = Σ_hp m[hp,h2]·T_hp and B_hp = Σ_h2 m[hp,h2]·A_h2
             (2·H² full-(bq,bk)-tile VPU FMA passes), dV_hp = B_hp^T @ g_hp
             (H more f32 matmuls — f32 MXU passes cost ~4x bf16).
    fused:   ghat_h2 = g ⊙ w_h2 in storage dtype (w_h2[j] = m[hp(j),h2],
             H cheap (bq,proj) scalings), then dA_h2 = ghat_h2 @ V_cat^T
             and dV += A_h2^T @ ghat_h2 — single-pass storage-dtype matmuls
             over the full proj contraction, and the 2·H² tile mixes vanish.

    Fused wins when the proj-deep bf16 matmul issues no more MXU slot
    passes than the H dh-deep f32 matmuls it replaces:
    ceil(H·dh/128) <= 3·ceil(dh/128) (conservative 3x f32 factor) — true
    for every fine/bottleneck level of the shipped presets (proj <= 384);
    the wide-proj mid/coarse levels (H8·dh96, H16·dh48, dh >= 192·H8)
    keep the legacy form.  In float32 storage both forms are the same
    exact sums reassociated; in bf16 the fused form rounds ghat/A to bf16
    before the MXU — the same rounding class the dk/dq matmuls already
    apply to ds."""
    proj = num_heads * dh
    return -(-proj // 128) <= 3 * -(-dh // 128)


def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_in_ref,
                    m_ref, *rest,
                    num_heads: int, n_q_valid: int, n_k_valid: int,
                    block_q: int, rate: float,
                    bn_corr: bool = False, fused: bool = False):
    if fused:
        w_exp_ref, rest = rest[0], rest[1:]
    if bn_corr:
        # batch-stats BatchNorm mode: dA gains the stats-gradient correction
        #   ΔdA_h2 = kappa_h2 + Σ_h3 G[h3, h2] · A_h3
        # (kappa, G precomputed in XLA from the BN cotangents — see
        # flash_reattention_train_bn's VJP)
        g_mat_ref, kappa_ref = rest[0], rest[1]
        dk_ref, dv_ref, dqp_ref, dk_s, dv_s = rest[2:]
    else:
        dk_ref, dv_ref, dqp_ref, dk_s, dv_s = rest
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
    valid = (row_ids < n_q_valid) & (col_ids < n_k_valid)

    v = v_ref[0]                                        # (bk, proj)
    if fused:
        g_sto = g_ref[0]                                # storage dtype
    else:
        g = g_ref[0].astype(jnp.float32)                # (bq, proj)
        t_tiles = []
        for hp in range(num_heads):
            sl = slice(hp * dh, (hp + 1) * dh)
            t_tiles.append(jax.lax.dot_general(
                g[:, sl], v[:, sl].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))

    # probabilities first (the bn correction needs every head's A before any
    # ds); p = normalised pre-dropout, a = dropout-masked
    p_tiles, a_tiles, masks = [], [], []
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
        p_tiles.append(p)
        masks.append(mask)
        a_tiles.append(p * mask if mask is not None else p)

    for h2 in range(num_heads):
        if fused:
            # dA_h2 = (g ⊙ w_h2) @ V_cat^T — one proj-deep matmul replaces
            # the H T_hp matmuls + H² tile FMA mix (see _fused_ghat)
            ghat = (g_sto.astype(jnp.float32)
                    * w_exp_ref[h2][None, :]).astype(g_sto.dtype)
            da = jax.lax.dot_general(
                ghat, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dV += A_h2^T @ ghat_h2 covers this head's contribution to
            # EVERY hp block at once (ghat's block hp is m[hp,h2]·g_hp)
            dv_s[...] = dv_s[...] + jax.lax.dot_general(
                a_tiles[h2].astype(v.dtype), ghat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bk, proj)
        else:
            da = jnp.zeros((block_q, block_k), jnp.float32)
            for hp in range(num_heads):
                da = da + m_ref[hp, h2] * t_tiles[hp]
        if bn_corr:
            da = da + kappa_ref[h2, 0]
            for h3 in range(num_heads):
                da = da + g_mat_ref[h3, h2] * a_tiles[h3]
        if masks[h2] is not None:
            da = da * masks[h2]
        d_row = d_in_ref[0, 0, h2][:, None]
        ds = p_tiles[h2] * (da - d_row)
        dk_s[h2] = dk_s[h2] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, h2], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, dh)
        # dq partial for this k tile (full dq = Σ_k partials, reduced in XLA;
        # padded rows have ds == 0 so the partials stay exact)
        dqp_ref[0, 0, 0, h2] = jax.lax.dot(
            ds.astype(k_ref.dtype), k_ref[0, h2],
            preferred_element_type=jnp.float32).astype(dqp_ref.dtype)

    if not fused:
        # dv_hp = B_hp^T @ g_hp, B_hp = sum_h2 m_eff[hp, h2] * A_h2
        for hp in range(num_heads):
            b_hp = jnp.zeros((block_q, block_k), jnp.float32)
            for h2 in range(num_heads):
                b_hp = b_hp + m_ref[hp, h2] * a_tiles[h2]
            sl = slice(hp * dh, (hp + 1) * dh)
            dv_s[:, sl] = dv_s[:, sl] + jax.lax.dot_general(
                b_hp, g[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bk, dh)

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


def _pad_rect(q, k, v_cat, block_q, block_k):
    """Rectangular padding: q rows to a block_q multiple, k/v tokens to a
    block_k multiple (the sequence-parallel per-shard shape has
    n_q = N/shards, n_k = N).  For square inputs with block_q == block_k
    (every single-chip call) this is identical to ``_pad_inputs``."""
    n_q, n_k = q.shape[2], k.shape[2]
    q_pad = -n_q % block_q
    k_pad = -n_k % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v_cat = jnp.pad(v_cat, ((0, 0), (0, k_pad), (0, 0)))
    return q, k, v_cat, n_q + q_pad, n_k + k_pad


def _fwd(q, k, v_cat, m_eff, c_eff, seed, *, num_heads, rate,
         block_q, block_k, interpret):
    batch, heads, n, dh = q.shape
    n_k = k.shape[2]
    proj = v_cat.shape[-1]
    q, k, v_cat, nq_pad, nk_pad = _pad_rect(q, k, v_cat, block_q, block_k)
    vsum = jnp.sum(v_cat.astype(jnp.float32), axis=1, keepdims=True)
    grid = (batch, nq_pad // block_q, nk_pad // block_k)
    nq = nq_pad // block_q

    out, lse, onorm = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, n_valid=n_k,
                          block_k=block_k, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((batch, nq_pad, proj), q.dtype),
            jax.ShapeDtypeStruct((batch, nq, heads, block_q), jnp.float32),
            jax.ShapeDtypeStruct((batch, nq, heads, block_q, proj), q.dtype),
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
                pl.BlockSpec((1, 1, num_heads, block_q, proj),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),
                pltpu.VMEM((num_heads, block_q, _lane_chunk(block_k)),
                           jnp.float32),
                pltpu.VMEM((num_heads, block_q, proj), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB physical VMEM; the 16 MiB default scoped budget
            # rejects wide-proj blocks (o_norm residual) that fit comfortably
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), q, k, v_cat, vsum,
      m_eff.astype(jnp.float32), c_eff.reshape(num_heads, 1).astype(jnp.float32))
    # lse (B, nq, H, bq) and o_norm (B, nq, H, bq, proj) stay in the kernel's
    # blocked layout — the backward consumes them as-is, avoiding a full
    # HBM-shuffle transpose of the (proj-wide) o_norm residual
    return out[:, :n, :], lse, vsum[:, 0, :], onorm


def _r_blocked(onorm, g_padded, batch, nq, block_q, heads, dh):
    """R[·,h2,·,hp] = Σ_m A_h2 ⊙ T_hp from the o_norm residual — pure XLA.

    With T_hp = g_hp @ v_hp^T and A_h2 the (normalised, dropout-masked)
    probabilities: R = Σ_d g_hp[n,d]·o_norm_h2[n, hp·dh+d].  All in the
    kernel's blocked layout (x = row-in-block): padded rows contribute
    nothing because g is zero-padded — zero relayout of the proj-wide
    residual.  Returns (B, nq, H2, bq, Hp).

    Formulated as  R = (o_norm ⊙ g) @ S  with S (proj, Hp) the head-block
    indicator, so the contraction runs over the MINOR (proj) axis of
    o_norm's native kernel layout and the multiply fuses into the dot.
    The earlier 6-D mul-reduce einsum made XLA materialise a transposed
    f32 copy of the proj-wide residual first (~1 ms per 600 MB, ~9 ms/step
    on base).  o_norm/g stay in their storage dtype: bf16·bf16 products
    are exact in f32 (preferred_element_type), bit-identical to upcasting
    first."""
    proj = heads * dh
    g4 = g_padded.reshape(batch, nq, block_q, proj)
    sel = jnp.repeat(jnp.eye(heads, dtype=onorm.dtype), dh, axis=0)
    return jnp.einsum("bqhxj,bqxj,jp->bqhxp", onorm, g4, sel,
                      preferred_element_type=jnp.float32)


def _bwd(q, k, v_cat, m_eff, seed, lse_blocked, onorm, g, *, num_heads, rate,
         block_q, block_k, interpret, d_extra=None, bn_extra=None):
    """Backward kernel pass.  ``d_extra``: optional (B, nq, H, bq) addition
    to the softmax-dot correction D (batch-stats BN mode); ``bn_extra``:
    optional (G (H,H), kappa (H,)) in-kernel dA correction coefficients."""
    batch, heads, n, dh = q.shape
    n_k = k.shape[2]
    proj = v_cat.shape[-1]

    q, k, v_cat, nq_pad, nk_pad = _pad_rect(q, k, v_cat, block_q, block_k)
    # g stays in its cotangent dtype (bf16 on the bench path): the kernel
    # upcasts the VMEM block, halving the HBM read that the dkv pass repeats
    # nk times
    g = jnp.pad(g, ((0, 0), (0, nq_pad - n), (0, 0)))
    nq, nk = nq_pad // block_q, nk_pad // block_k
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    m32 = m_eff.astype(jnp.float32)

    # D (softmax-dot correction) + dm_eff via the o_norm residual — no
    # kernel pass:  dm_eff[hp,h2] = Σ R,  D_h2 = Σ_hp m_eff[hp,h2]·R, landing
    # directly in the (B, nq, H, bq) blocked shape the kernel consumes.
    r = _r_blocked(onorm, g, batch, nq, block_q, heads, dh)
    dm_eff = jnp.einsum("bqhxp->ph", r)                  # (Hp, H2)
    d_arr = jnp.einsum("ph,bqhxp->bqhx", m32, r)         # (B, nq, H, bq)
    if d_extra is not None:
        d_arr = d_arr + d_extra

    m_spec = pl.BlockSpec((num_heads, num_heads), lambda *a, **_: (0, 0),
                          memory_space=pltpu.SMEM)

    # single kernel pass: dk + dv + dq partials — grid over k tiles, loop
    # over q tiles; every (q, k) tile's scores are recomputed exactly once
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
    extra_args = []
    fused = _fused_ghat(num_heads, dh)
    if fused:
        # dh-expanded head-mix weights for the fused dA/dV matmuls:
        # w_exp[h2, hp*dh + d] = m_eff[hp, h2]
        dkv_in.append(pl.BlockSpec((num_heads, proj),
                                   lambda *a, **_: (0, 0)))
        extra_args.append(jnp.repeat(m32.T, dh, axis=1))
    if bn_extra is not None:
        g_mat, kappa = bn_extra
        dkv_in.append(m_spec)                            # G (H, H)
        dkv_in.append(pl.BlockSpec((num_heads, 1), lambda *a, **_: (0, 0),
                                   memory_space=pltpu.SMEM))
        extra_args.extend([g_mat.astype(jnp.float32),
                           kappa.reshape(num_heads, 1).astype(jnp.float32)])
    dk, dv, dq_part = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_heads=num_heads,
                          n_q_valid=n, n_k_valid=n_k,
                          block_q=block_q, rate=rate,
                          bn_corr=bn_extra is not None, fused=fused),
        out_shape=(
            jax.ShapeDtypeStruct((batch, nk, heads, block_k, dh), jnp.float32),
            jax.ShapeDtypeStruct((batch, nk_pad, proj), jnp.float32),
            jax.ShapeDtypeStruct((batch, nk, nq, heads, block_q, dh), q.dtype),
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
                pl.BlockSpec((1, 1, 1, num_heads, block_q, dh),
                             lambda bi, ki, qi, *_: (bi, ki, qi, 0, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_k, dh), jnp.float32),
                pltpu.VMEM((block_k, proj), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e has 128 MiB physical VMEM; the 16 MiB default scoped budget
            # rejects wide-proj blocks (o_norm residual) that fit comfortably
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, q, k, v_cat, g, lse_blocked, d_arr, m32, *extra_args)
    dk = dk.transpose(0, 2, 1, 3, 4).reshape(
        batch, heads, nk_pad, dh)[:, :, :n_k]
    dv = dv[:, :n_k, :]
    dq = jnp.sum(dq_part.astype(jnp.float32), axis=1)    # (B, nq, H, bq, dh)
    dq = dq.transpose(0, 2, 1, 3, 4).reshape(
        batch, heads, nq_pad, dh)[:, :, :n]
    return dq, dk, dv, dm_eff


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_reattention_train(q, k, v_cat, m_eff, c_eff, seed,
                            num_heads, rate=0.0, block_q=128, block_k=128,
                            interpret=False):
    """Training-path fused re-attention with dropout + custom VJP.

    q: (B, H, N_q, dh), pre-scaled; k: (B, H, N_k, dh);
    v_cat: (B, N_k, H*dh).  Rectangular shapes (N_q != N_k) are the
    sequence-parallel per-shard geometry: local query rows against the
    all-gathered keys/values (parallel/sequence.py).
    m_eff: (H, H) head-mix affine (``fold_reattention_compact``);
    c_eff: (H,) bias; seed: int32 scalar for the in-kernel dropout PRNG.
    Returns (B, N_q, H*dh).
    """
    out, _, _, _ = _fwd(q, k, v_cat, m_eff, c_eff, seed, num_heads=num_heads,
                        rate=rate, block_q=block_q, block_k=block_k,
                        interpret=interpret)
    return out


def _vjp_fwd(q, k, v_cat, m_eff, c_eff, seed,
             num_heads, rate, block_q, block_k, interpret):
    out, lse, vsum, onorm = _fwd(q, k, v_cat, m_eff, c_eff, seed,
                                 num_heads=num_heads, rate=rate,
                                 block_q=block_q, block_k=block_k,
                                 interpret=interpret)
    return out, (q, k, v_cat, m_eff, c_eff, seed, lse, vsum, onorm)


def _vjp_bwd(num_heads, rate, block_q, block_k, interpret, res, g):
    q, k, v_cat, m_eff, c_eff, seed, lse, vsum, onorm = res
    dh = q.shape[-1]
    dq, dk, dv, dm_eff = _bwd(q, k, v_cat, m_eff, seed, lse, onorm, g,
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


# ---------------------------------------------------------------------------
# batch-stats BatchNorm mode — EXACT reference train-step semantics
# ---------------------------------------------------------------------------
#
# The reference's only stateful layer is the BatchNorm over the head-mixed
# attention maps (torch/model.py:136,159), which trains on *batch*
# statistics.  ``flash_reattention_train`` freezes them (running stats); this
# mode computes them exactly, still without materialising the (N, N) map:
#
# forward (2 kernel sweeps + XLA):
#   1. _stats_kernel: per-row sums of the dropout-masked probabilities,
#        S_h[n]      = Σ_m A_h[n, m]
#        C_h2h3[n]   = Σ_m A_h2[n, m] · A_h3[n, m]
#      (online-softmax rescaling, all H probability tiles live per k step);
#   2. XLA: μ, σ² of the conv-mixed map  ĉ_h = Σ_h2 W[h,h2]·A_h2 + cb_h
#      follow from ΣS and ΣC:  Σĉ = W·ΣS + cnt·cb,
#      Σĉ² = Σ W W ΣC + 2·cb·W·ΣS + cnt·cb²;  fold (W, cb, γ, β, μ, σ²)
#      into the (H, H) affine exactly as the eval fold does;
#   3. the ordinary forward kernel applies the folded affine.
#
# backward (1 kernel sweep + XLA): holding stats fixed it is the ordinary
# fused backward with the batch-stat affine.  The stats' own gradient
# (∂L/∂μ, ∂L/∂σ² via the fold, obtained with jax.vjp) adds
#   dĉ_stats_h[n,m] = e1_h + e2_h·ĉ_h[n,m],
#       e1 = (u − 2wμ)/cnt,  e2 = 2w/cnt
# which, pushed through the conv mix, is  ΔdA_h2 = κ_h2 + Σ_h3 G[h3,h2]·A_h3
# with κ_h2 = Σ_h W[h,h2](e1_h + e2_h·cb_h), G[h3,h2] = Σ_h e2_h·W[h,h2]·W[h,h3]
# — one extra in-kernel mix (bn_corr) plus a D correction computed from the
# per-row S/C residuals in XLA.  Direct ∂(μ,σ²)/∂(W, cb) terms are closed-form
# in ΣS/ΣC.  Gradient parity vs flax BatchNorm(use_running_average=False) is
# tested in tests/test_kernels_train.py.


def _bn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, s_ref, c_ref, lse_ref,
                   onorm_ref, m_s, l_s, ps_s, cc_s, acc_s, *,
                   num_heads: int, n_q_valid: int, n_k_valid: int,
                   block_k: int, rate: float):
    """ONE sweep for the batch-stats mode: per-head PV accumulators (o_norm)
    + LSE + the per-row S/C probability sums the BN moments need.  The
    m_eff/c_eff head-mix is NOT applied here — with batch statistics it is
    only known after the global reduction, so the caller applies it as a
    cheap XLA epilogue over the o_norm residual."""
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        ps_s[...] = jnp.zeros_like(ps_s)
        cc_s[...] = jnp.zeros_like(cc_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    block_q = q_ref.shape[2]
    k_start = ki * block_k
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
    key_mask = col_ids < n_k_valid

    v = v_ref[0]                                        # (block_k, proj)
    alphas = []
    p_tiles = []
    for h in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.where(key_mask, s, NEG_INF)
        m_prev = m_s[h]
        l_prev = l_s[h]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])   # (bq, 1)
        p = jnp.exp(s - m_next[:, :1])
        l_s[h] = alpha * l_prev + _chunk_sum(p)
        m_s[h] = m_next
        if rate > 0.0:
            p = p * _dropout_mask(seed_ref, rate, bi, h, qi, ki, nq, nk,
                                  num_heads, (block_q, block_k))
        p_tiles.append(p)                               # dropout-masked
        ps_s[h] = alpha * ps_s[h] + _chunk_sum(p)
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_s[h] = acc_s[h] * alpha + pv
        alphas.append(alpha)

    # cross sums, C symmetric upper triangle only: per pair accumulate
    # 128-lane partials of Σ_m A_h2 ⊙ A_h3 (relative to the running maxima,
    # so rescale by alpha_h2 · alpha_h3).  No cross-lane reduction and no
    # lane-scatter concat in the k-loop — both deferred to the epilogue
    # (the per-step reduces+concats were the dominant stats-sweep cost).
    w = _lane_chunk(block_k)
    nchunk = block_k // w
    pi = 0
    for h2 in range(num_heads):
        for h3 in range(h2, num_heads):
            prod = p_tiles[h2][:, :w] * p_tiles[h3][:, :w]
            for j in range(1, nchunk):
                sl = slice(j * w, (j + 1) * w)
                prod = prod + p_tiles[h2][:, sl] * p_tiles[h3][:, sl]
            cc_s[pi] = (alphas[h2] * alphas[h3]) * cc_s[pi] + prod
            pi += 1

    @pl.when(ki == nk - 1)
    def _epilogue():
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0) + qi * block_q
        row_valid = row_ids < n_q_valid                  # (bq, 1)
        linvs = []
        s_rows = []
        lse_rows = []
        for h in range(num_heads):
            l = jnp.sum(l_s[h], axis=1, keepdims=True)
            linv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            linvs.append(linv)
            sval = jnp.sum(ps_s[h], axis=1, keepdims=True) * linv
            s_rows.append(jnp.where(row_valid, sval, 0.0).T)  # (1, bq)
            lse_rows.append(
                (m_s[h][:, :1] + jnp.log(jnp.maximum(l, 1e-30))).T)
            onorm_ref[0, 0, h] = (acc_s[h] * linv).astype(onorm_ref.dtype)
        s_ref[0, 0] = jnp.concatenate(s_rows, axis=0)    # (H, bq)
        lse_ref[0, 0] = jnp.concatenate(lse_rows, axis=0)
        csums = {}
        pi = 0
        for h2 in range(num_heads):
            for h3 in range(h2, num_heads):
                csums[(h2, h3)] = jnp.sum(cc_s[pi], axis=1, keepdims=True)
                pi += 1
        for h2 in range(num_heads):
            rows = []
            for h3 in range(num_heads):
                cval = (csums[(min(h2, h3), max(h2, h3))]
                        * linvs[h2] * linvs[h3])
                rows.append(jnp.where(row_valid, cval, 0.0).T)
            c_ref[0, 0, h2] = jnp.concatenate(rows, axis=0)  # (H3, bq)


def _bn_fwd(q, k, v_cat, seed, *, num_heads, rate, block_q, block_k,
            interpret):
    """One-sweep batch-stats forward: (S, C, lse, o_norm, vsum), blocked."""
    batch, heads, n, dh = q.shape
    n_k = k.shape[2]
    proj = v_cat.shape[-1]
    q, k, v_cat, nq_pad, nk_pad = _pad_rect(q, k, v_cat, block_q, block_k)
    vsum = jnp.sum(v_cat.astype(jnp.float32), axis=1)    # (B, proj)
    nq, nk = nq_pad // block_q, nk_pad // block_k
    s_rows, c_rows, lse, onorm = pl.pallas_call(
        functools.partial(_bn_fwd_kernel, num_heads=num_heads,
                          n_q_valid=n, n_k_valid=n_k,
                          block_k=block_k, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct((batch, nq, heads, block_q), jnp.float32),
            jax.ShapeDtypeStruct((batch, nq, heads, heads, block_q),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, nq, heads, block_q), jnp.float32),
            jax.ShapeDtypeStruct((batch, nq, heads, block_q, proj), q.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, nq, nk),
            in_specs=[
                pl.BlockSpec((1, heads, block_q, dh),
                             lambda bi, qi, ki, *_: (bi, 0, qi, 0)),
                pl.BlockSpec((1, heads, block_k, dh),
                             lambda bi, qi, ki, *_: (bi, 0, ki, 0)),
                pl.BlockSpec((1, block_k, proj),
                             lambda bi, qi, ki, *_: (bi, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
                pl.BlockSpec((1, 1, heads, heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0, 0)),
                pl.BlockSpec((1, 1, heads, block_q),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0)),
                pl.BlockSpec((1, 1, heads, block_q, proj),
                             lambda bi, qi, ki, *_: (bi, qi, 0, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((num_heads, block_q, 128), jnp.float32),  # m
                pltpu.VMEM((num_heads, block_q, _lane_chunk(block_k)),
                           jnp.float32),                             # l
                pltpu.VMEM((num_heads, block_q, _lane_chunk(block_k)),
                           jnp.float32),                             # ps
                pltpu.VMEM((heads * (heads + 1) // 2, block_q,
                            _lane_chunk(block_k)), jnp.float32),     # cc pairs
                pltpu.VMEM((num_heads, block_q, proj), jnp.float32),  # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), q, k, v_cat)
    return s_rows, c_rows, lse, onorm, vsum


def _psum_maybe(x, axes):
    return jax.lax.psum(x, axes) if axes else x


def _bn_moments(s_rows, c_rows, conv_m, conv_c, cnt, psum_axes=None):
    """(μ, σ², ΣS, ΣC) of ĉ = Σ_h2 W[·,h2]·A_h2 + cb over (B, N, M).

    Moments are taken about cb (``ĉ − cb = W·A`` exactly): the naive
    E[ĉ²] − μ² cancels catastrophically in f32 because μ ≈ cb dominates the
    deviation, costing ~3 digits of variance; centred, E[(W·A)²] and
    (μ − cb)² are the same scale as the variance itself.

    ``psum_axes`` (inside shard_map): the row sums are per-shard partials —
    psum them so the moments are the GLOBAL batch's, exactly as the
    unsharded computation (``cnt`` is then the global element count)."""
    ssum = _psum_maybe(jnp.sum(s_rows, axis=(0, 1, 3)), psum_axes)  # (H,)
    csum = _psum_maybe(jnp.sum(c_rows, axis=(0, 1, 4)), psum_axes)  # (H2, H3)
    w = conv_m.astype(jnp.float32)
    cb = conv_c.astype(jnp.float32)
    dev = (w @ ssum) / cnt                               # μ − cb  (H,)
    mu = dev + cb
    var = jnp.einsum("ha,hb,ab->h", w, w, csum) / cnt - dev * dev
    return mu, var, ssum, csum


def _bn_primal(q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
               num_heads, rate, block_q, block_k, interpret,
               eps, reatten_scale, psum_axes=None, cnt=None):
    from vit_unet_tpu.kernels.flash_reattention import fold_reattention_compact

    batch, heads, n, dh = q.shape
    proj = v_cat.shape[-1]
    if cnt is None:
        cnt = batch * n * k.shape[2]
    # ONE kernel sweep produces the PV accumulators (o_norm), LSE, and the
    # per-row S/C sums; the batch-stat affine is only known after the global
    # moment reduction, so the head-mix runs as an XLA epilogue over o_norm
    # (bandwidth-bound: two passes over the residual) instead of a second
    # QK+softmax sweep.
    s_rows, c_rows, lse, onorm, vsum = _bn_fwd(
        q, k, v_cat, seed, num_heads=num_heads, rate=rate,
        block_q=block_q, block_k=block_k, interpret=interpret)
    mu, var, _, _ = _bn_moments(s_rows, c_rows, conv_m, conv_c, cnt,
                                psum_axes)
    m_eff, c_eff = fold_reattention_compact(
        conv_m, conv_c, gamma, beta, mu, var, eps=eps,
        reatten_scale=reatten_scale)
    nq = onorm.shape[1]
    # Head-mix epilogue over the proj-flat residual:  out[..., j] =
    # Σ_h W[h, j]·o_norm_h[..., j]  with W the dh-expanded affine
    # (W[h, p·dh+d] = m_eff[p, h]) — reduce over the SIZE-H axis with j
    # elementwise, so o_norm is read once in its native layout (the 6-D
    # head-split einsum made XLA materialise a transposed f32 copy first).
    # o_norm stays bf16; products are exact in f32 (preferred f32).
    w_exp = jnp.repeat(m_eff.astype(jnp.float32).T, dh, axis=1)  # (H2, proj)
    mixed = jnp.einsum("hj,bqhxj->bqxj", w_exp, onorm,
                       preferred_element_type=jnp.float32)
    out = mixed.reshape(batch, nq * block_q, proj)[:, :n, :]
    c_rep = jnp.repeat(c_eff.astype(jnp.float32), dh)    # (proj,)
    out = (out + (c_rep[None, :] * vsum)[:, None, :]).astype(q.dtype)
    return out, mu, var, (s_rows, c_rows, lse, vsum, onorm, m_eff, c_eff)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16))
def flash_reattention_train_bn(q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
                               num_heads, rate=0.0, block_q=128, block_k=128,
                               interpret=False, eps=1e-5, reatten_scale=1.0,
                               psum_axes=None, cnt=None):
    """Fused re-attention training step with EXACT batch-stats BatchNorm.

    conv_m: (H, H) head-mix conv matrix [h_out, h_in]; conv_c: (H,) conv
    bias; gamma/beta: (H,) BN affine.  Returns (out (B, N_q, H·dh), μ (H,),
    σ² (H,)) — μ/σ² are the batch moments for the caller's running-average
    update (flax BatchNorm convention: biased variance).

    Sequence-parallel use (inside shard_map, rectangular q vs gathered
    K/V): pass ``psum_axes`` (the mesh axes the (batch, row) plane is
    sharded over) and ``cnt`` (the GLOBAL b·n_rows·n_cols element count) —
    the moments and every through-the-statistics gradient term are then
    psum'd to the exact global values, and the returned parameter
    cotangents are pre-divided by the shard count so shard_map's boundary
    psum (the transpose of the replicated in_spec) restores them.
    """
    out, mu, var, _ = _bn_primal(q, k, v_cat, conv_m, conv_c, gamma, beta,
                                 seed, num_heads, rate, block_q, block_k,
                                 interpret, eps, reatten_scale,
                                 psum_axes, cnt)
    return out, mu, var


def _bn_vjp_fwd(q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
                num_heads, rate, block_q, block_k, interpret, eps,
                reatten_scale, psum_axes, cnt):
    out, mu, var, aux = _bn_primal(q, k, v_cat, conv_m, conv_c, gamma, beta,
                                   seed, num_heads, rate, block_q, block_k,
                                   interpret, eps, reatten_scale,
                                   psum_axes, cnt)
    s_rows, c_rows, lse, vsum, onorm, m_eff, c_eff = aux
    return (out, mu, var), (q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
                            s_rows, c_rows, lse, vsum, onorm, m_eff, c_eff,
                            mu, var)


def _bn_vjp_bwd(num_heads, rate, block_q, block_k, interpret, eps,
                reatten_scale, psum_axes, cnt, res, cots):
    from vit_unet_tpu.kernels.flash_reattention import fold_reattention_compact

    (q, k, v_cat, conv_m, conv_c, gamma, beta, seed,
     s_rows, c_rows, lse, vsum, onorm, m_eff, c_eff, mu, var) = res
    g, g_mu, g_var = cots
    batch, heads, n, dh = q.shape
    if cnt is None:
        cnt = batch * n * k.shape[2]
    # the boundary psum of shard_map's replicated in_specs will re-sum the
    # parameter cotangents across shards; everything below computes the
    # GLOBAL value on every shard, so pre-divide by the shard count.
    # Conversely, shard_map hands each shard the cotangent of a replicated
    # OUTPUT (μ, σ², out_spec P(None)) divided by the shard count — scale
    # g_mu/g_var back to the full value before they enter the global
    # formulas (pinned by tests vs the unsharded kernel).
    shards = jax.lax.psum(1.0, psum_axes) if psum_axes else 1.0
    g_mu = g_mu.astype(jnp.float32) * shards
    g_var = g_var.astype(jnp.float32) * shards
    w32 = conv_m.astype(jnp.float32)
    cb32 = conv_c.astype(jnp.float32)

    # --- fixed-stats cotangents (affine part) --------------------------------
    nq_pad = n + (-n % block_q)
    nq = nq_pad // block_q
    gp = jnp.pad(g, ((0, 0), (0, nq_pad - n), (0, 0)))   # storage dtype
    r = _r_blocked(onorm, gp, batch, nq, block_q, heads, dh)
    dm_eff = _psum_maybe(jnp.einsum("bqhxp->ph", r), psum_axes)  # (Hp, H2)
    gsum = jnp.sum(g.astype(jnp.float32), axis=1)        # (B, proj)
    dc_eff = _psum_maybe(
        jnp.sum((gsum * vsum.astype(jnp.float32)).reshape(
            batch, heads, dh), axis=(0, 2)), psum_axes)  # (H,)

    # --- cotangents into (W, cb, γ, β, μ, σ²) through the fold ---------------
    fold = lambda cm, cc, ga, be, m_, v_: fold_reattention_compact(
        cm, cc, ga, be, m_, v_, eps=eps, reatten_scale=reatten_scale)
    fold_out, fold_vjp = jax.vjp(fold, conv_m, conv_c, gamma, beta, mu, var)
    # cotangent dtypes must match the fold's outputs (which promote to f32
    # when bf16 params mix with the f32 batch moments)
    d_cm, d_cc, d_ga, d_be, u, wv = fold_vjp(
        (dm_eff.astype(fold_out[0].dtype), dc_eff.astype(fold_out[1].dtype)))
    u = u.astype(jnp.float32) + g_mu.astype(jnp.float32)
    wv = wv.astype(jnp.float32) + g_var.astype(jnp.float32)

    # --- stats-gradient correction coefficients ------------------------------
    e1 = (u - 2.0 * wv * mu) / cnt                       # (H,)
    e2 = 2.0 * wv / cnt                                  # (H,)
    kappa = jnp.einsum("hg,h->g", w32, e1 + e2 * cb32)   # (H2,)
    g_mat = jnp.einsum("hg,h,hf->fg", w32, e2, w32)      # (H3, H2)

    # D correction: Σ_m ΔdA_h2 ⊙ A_h2 per row, from the S/C row residuals
    #   = κ_h2·S_h2[n] + Σ_h3 G[h3,h2]·C_h3h2[n]
    d_extra = (jnp.einsum("h,bqhx->bqhx", kappa, s_rows)
               + jnp.einsum("fh,bqfhx->bqhx", g_mat, c_rows))

    dq, dk, dv, _ = _bwd(q, k, v_cat, m_eff, seed, lse, onorm, g,
                         num_heads=num_heads, rate=rate, block_q=block_q,
                         block_k=block_k, interpret=interpret,
                         d_extra=d_extra, bn_extra=(g_mat, kappa))
    c_rep = jnp.repeat(c_eff.astype(jnp.float32), dh)
    dv = dv + (c_rep[None, :] * gsum)[:, None, :]

    # --- direct ∂(μ, σ²)/∂(W, cb) terms --------------------------------------
    ssum = _psum_maybe(jnp.sum(s_rows, axis=(0, 1, 3)), psum_axes)  # (H,)
    csum = _psum_maybe(jnp.sum(c_rows, axis=(0, 1, 4)), psum_axes)  # (H2,H3)
    #   ∂μ_h/∂W[h,h2] = ΣS_h2/cnt
    #   ∂σ²_h/∂W[h,h2] = 2(Σ_h3 W[h,h3]·ΣC_h3h2 + cb_h·ΣS_h2 − μ_h·ΣS_h2)/cnt
    d_cm = d_cm.astype(jnp.float32) + (
        u[:, None] * ssum[None, :] / cnt
        + 2.0 * wv[:, None] * (w32 @ csum
                               + (cb32 - mu)[:, None] * ssum[None, :]) / cnt)
    #   ∂μ/∂cb = 1, ∂σ²/∂cb = 0 (shift-invariant).  The fold's a·cb term and
    #   −a·μ's cotangent cancel EXACTLY (batch normalisation removes any
    #   uniform shift of the map, so the output is cb-invariant); assembling
    #   d_cc = fold_dcb + u·1 would subtract two large equal f32 quantities
    #   and keep only their rounding noise — use the analytic result: only
    #   the direct μ-output cotangent survives.
    del d_cc
    d_cc = g_mu.astype(jnp.float32)

    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v_cat.dtype),
            (d_cm / shards).astype(conv_m.dtype),
            (d_cc / shards).astype(conv_c.dtype),
            (d_ga / shards).astype(gamma.dtype),
            (d_be / shards).astype(beta.dtype), None)


flash_reattention_train_bn.defvjp(_bn_vjp_fwd, _bn_vjp_bwd)


def flash_bn_batch_moments(q, k, v_cat, conv_m, conv_c, seed, num_heads,
                           rate=0.0, block_q=128, block_k=128,
                           interpret=False, psum_axes=None, cnt=None):
    """Batch moments (μ, σ²) of the head-mixed attention map, WITHOUT
    normalising with them — the stats half of ``flash_reattention_train_bn``
    on its own (same ``_bn_fwd`` sweep + closed-form moment assembly; the
    N×N map never touches HBM).

    Used by the BN *tracking* train mode (``ReAttention(bn_track=True)``):
    the forward normalises with the running statistics (the frozen kernel),
    while the running averages are updated toward each batch's own moments
    so a later flip to exact batch-stats semantics
    (``flash_reattention_train_bn``) is a continuous change of the forward
    function instead of a normalisation shock.  See docs/PERF.md
    "End-to-end training behavior".

    NOT differentiable (``_bn_fwd`` is a raw pallas_call with no VJP) — the
    caller must wrap the call in ``jax.lax.stop_gradient``/``stop_gradient``
    on the inputs; the tracking EMA update is semantically a non-gradient
    side channel anyway (flax BatchNorm's own running updates are also
    outside the gradient).

    ``rate``/``seed`` must match the paired forward call so the moments are
    those of the same dropout-masked probabilities the forward used.
    """
    batch, heads, n, dh = q.shape
    if cnt is None:
        cnt = batch * n * k.shape[2]
    s_rows, c_rows, _, _, _ = _bn_fwd(
        q, k, v_cat, seed, num_heads=num_heads, rate=rate,
        block_q=block_q, block_k=block_k, interpret=interpret)
    mu, var, _, _ = _bn_moments(s_rows, c_rows, conv_m, conv_c, cnt,
                                psum_axes)
    return mu, var
