"""Sequence (context) parallelism for re-attention over the token axis.

The reference has no sequence parallelism (SURVEY.md §2.2) — its finest
hierarchy level is quadratically attention-bound (N=4096 tokens for the 512²
notebook config) and it copes by keeping images ≤512².  This module is the
TPU-native extension: shard the *query token* axis across the 'model' mesh
axis, all-gather K/V once per layer over ICI, and compute each shard's rows
locally — gather-based sequence parallelism (the Ulysses-style tradeoff:
one all-gather of K/V instead of ring steps, right for moderate N where K/V
fit each chip).

Composes with the re-attention head-mix fold (kernels/flash_reattention.py):
the (H, H) affine + bias commute with the row-parallel contraction, so the
full eval-mode re-attention (softmax -> conv+BN head mix -> @V) runs
sequence-parallel without materialising cross-shard attention.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _batch_spec(mesh: Mesh, data_axis: Optional[str],
                batch: int) -> Optional[str]:
    """The batch-dim mesh axis, or None if the batch must be replicated
    (axis missing, or batch not divisible by the axis size)."""
    if not data_axis or data_axis not in mesh.shape:
        return None
    return data_axis if batch % mesh.shape[data_axis] == 0 else None


def _local_reattention(q, k, v, m_eff, c_eff, *, axis: str,
                       use_flash: bool, interpret: bool):
    """Per-shard body under shard_map: q is the local row block (already
    scaled); k/v are local blocks that get all-gathered here.

    ``use_flash=True`` runs the fused Pallas kernel per shard (rectangular
    attention: local query rows vs the gathered keys/values) — the N² map
    never touches HBM on any chip, composing the long-context answer
    (sequence parallel over ICI) with the memory answer (flash).
    """
    k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
    if use_flash:
        from vit_unet_tpu.kernels.flash_reattention import (
            expand_reattention_affine, flash_reattention, pick_flash_block)
        heads, dh = q.shape[1], q.shape[3]
        w, bias = expand_reattention_affine(m_eff, c_eff, dh=dh)
        v_cat = v_full.transpose(0, 2, 1, 3).reshape(
            v_full.shape[0], v_full.shape[2], heads * dh)
        # rectangular tile pick: local query rows vs the gathered token
        # axis (the same sweep-measured envelope as the single-chip call;
        # e.g. the lite fine level sharded 4-way runs 512 tiles, not 128)
        blk = pick_flash_block(q.shape[2], k_full.shape[2],
                               num_heads=heads, dh=dh)
        return flash_reattention(q, k_full, v_cat, w, bias,
                                 num_heads=heads, block_q=blk, block_k=blk,
                                 interpret=interpret)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k_full,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    attn = (jnp.einsum("gh,bhnm->bgnm", m_eff, attn)
            + c_eff[None, :, None, None])
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v_full.dtype), v_full)
    b, h, n, dh = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


def sequence_parallel_reattention(
    q: jnp.ndarray,          # (B, H, N, dh), pre-scaled by qk_scale
    k: jnp.ndarray,          # (B, H, N, dh)
    v: jnp.ndarray,          # (B, H, N, dh)
    m_eff: jnp.ndarray,      # (H, H) folded head-mix affine
    c_eff: jnp.ndarray,      # (H,)
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
    use_flash: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Eval-mode re-attention with the token axis sharded over ``axis``.

    Token count must divide the axis size.  The batch axis stays sharded
    over ``data_axis`` when the mesh has one (composes with the DP train
    step); pass ``data_axis=None`` to replicate the batch.
    ``use_flash=True`` runs the fused Pallas kernel per shard (interpret
    mode off-TPU, auto-detected).  Returns the merged-head (B, N, H*dh)
    output.
    """
    n = q.shape[2]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"token count {n} not divisible by mesh axis "
                         f"{axis!r} of size {size}")
    if interpret is None:
        interpret = mesh.devices.reshape(-1)[0].platform != "tpu"
    ba = _batch_spec(mesh, data_axis, q.shape[0])
    tok = P(ba, None, axis, None)
    out_spec = P(ba, axis, None)
    fn = jax.shard_map(
        partial(_local_reattention, axis=axis, use_flash=use_flash,
                interpret=interpret),
        mesh=mesh,
        in_specs=(tok, tok, tok, P(None, None), P(None)),
        out_specs=out_spec,
        # pallas_call doesn't annotate varying-mesh-axes metadata on its
        # outputs; the specs above already pin the sharding
        check_vma=False,
    )
    return fn(q, k, v, m_eff, c_eff)


def _local_reattention_train(q, k, v, mix_kernel, mix_bias, bn_scale, bn_bias,
                             rm, rv, seed, *, axis: str,
                             batch_axis: Optional[str], rate: float,
                             eps: float, reatten_scale: float,
                             use_batch_stats: bool,
                             n_global: int, b_global: int,
                             use_flash: bool = False,
                             interpret: bool = False,
                             track: bool = False):
    """Training-mode per-shard body: softmax -> attention dropout ->
    1x1 head-mix conv -> BatchNorm with *batch* statistics psum'd across
    every shard of the (batch, token-row) plane -> @V.

    Matches the XLA path's train semantics (nn.Dropout + nn.Conv + nn.BatchNorm
    with use_running_average=False) up to the dropout random stream.
    Returns (out, batch_mean, batch_var) — the stats let the caller update
    the BN running averages exactly.

    ``use_flash``: the rectangular fused train kernels per shard — local
    query rows vs the gathered K/V, custom VJP, in-kernel dropout — so no
    (n_local, N) map or mask ever reaches HBM.  Frozen-stats mode folds the
    running stats into the affine; batch-stats mode runs the bn kernel with
    ``psum_axes`` so the moments and through-the-statistics gradients are
    the exact global values.
    """
    k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
    if use_flash:
        from vit_unet_tpu.kernels.flash_reattention import (
            fold_reattention_compact, pick_flash_block)
        from vit_unet_tpu.kernels.flash_reattention_train import (
            flash_reattention_train, flash_reattention_train_bn)

        heads, dh = q.shape[1], q.shape[3]
        v_cat = v_full.transpose(0, 2, 1, 3).reshape(
            v_full.shape[0], v_full.shape[2], heads * dh)
        # distinct in-kernel dropout stream per (sequence, data) shard: the
        # kernel folds (batch, head, q-tile, k-tile) into the seed itself,
        # and those indices are *local* — identical across shards — so the
        # shard index must stride past the whole local index space
        kseed = jax.lax.convert_element_type(seed.reshape(-1)[-1], jnp.int32)
        idx = jax.lax.axis_index(axis)
        if batch_axis is not None:
            idx = idx + jax.lax.axis_size(axis) * jax.lax.axis_index(batch_axis)
        kseed = kseed + idx * (1 << 20)
        # exact-BN and the tracking moments sweep run the batch-stats
        # kernels: those keep the bn tile envelope
        blk = pick_flash_block(q.shape[2], k_full.shape[2],
                               num_heads=heads, dh=dh, train=True,
                               bn=use_batch_stats or track)
        if not use_batch_stats:
            m_eff, c_eff = fold_reattention_compact(
                mix_kernel.T, mix_bias, bn_scale, bn_bias, rm, rv,
                eps=eps, reatten_scale=reatten_scale)
            out = flash_reattention_train(q, k_full, v_cat, m_eff, c_eff,
                                          kseed, heads, rate, blk, blk,
                                          interpret)
            if track:
                # tracking-BN warmup under SP: a stop-gradient stats sweep
                # (same kseed/rate, so the moments are those of the masked
                # probabilities the frozen forward used) with cross-shard
                # psums — the returned moments equal the unsharded batch
                # moments exactly, feeding the caller's EMA side channel
                from vit_unet_tpu.kernels.flash_reattention_train import (
                    flash_bn_batch_moments)
                sg = jax.lax.stop_gradient
                axes = (axis,) if batch_axis is None else (axis, batch_axis)
                mu, var = flash_bn_batch_moments(
                    sg(q), sg(k_full), sg(v_cat), sg(mix_kernel.T),
                    sg(mix_bias), kseed, heads, rate, blk, blk, interpret,
                    psum_axes=axes, cnt=b_global * n_global * n_global)
                return out, mu, var
            return out, rm.astype(jnp.float32), rv.astype(jnp.float32)
        # EXACT batch-stats mode: the bn kernel's moments and
        # through-the-statistics gradient terms psum across every shard of
        # the (batch, row) plane, so out/μ/σ²/grads equal the unsharded
        # kernel's exactly (cnt = the GLOBAL element count)
        axes = (axis,) if batch_axis is None else (axis, batch_axis)
        out, mean, var = flash_reattention_train_bn(
            q, k_full, v_cat, mix_kernel.T, mix_bias, bn_scale, bn_bias,
            kseed, heads, rate, blk, blk, interpret, eps, reatten_scale,
            axes, b_global * n_global * n_global)
        return out, mean, var
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k_full,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        # unique stream per (data, sequence) shard
        idx = jax.lax.axis_index(axis)
        if batch_axis is not None:
            idx = idx + jax.lax.axis_size(axis) * jax.lax.axis_index(batch_axis)
        key = jax.random.fold_in(jax.random.wrap_key_data(seed), idx)
        keep = jax.random.bernoulli(key, 1.0 - rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    # 1x1 conv across heads on the (B, N, M, H)-oriented tensor:
    # out_head g = sum_h kernel[h, g] * p_h + bias[g]
    a = (jnp.einsum("hg,bhnm->bgnm", mix_kernel.astype(jnp.float32), p)
         + mix_bias.astype(jnp.float32)[None, :, None, None])
    # BatchNorm batch statistics over (batch, rows, cols) — rows are sharded
    # over `axis` (and batch over `batch_axis`): psum partial sums so stats
    # equal the unsharded computation's exactly
    if use_batch_stats:
        axes = (axis,) if batch_axis is None else (axis, batch_axis)
        cnt = jnp.asarray(b_global * n_global * a.shape[3], jnp.float32)
        mean = jax.lax.psum(jnp.sum(a, axis=(0, 2, 3)), axes) / cnt
        sq = jax.lax.psum(jnp.sum(jnp.square(a), axis=(0, 2, 3)), axes) / cnt
        var = jnp.maximum(sq - jnp.square(mean), 0.0)  # match flax BatchNorm
        ret_mean, ret_var = mean, var
    else:
        # dropout-under-frozen-stats mode (use_running_average=True while
        # training, or the tracking warmup): normalise with the running
        # averages
        mean = rm.astype(jnp.float32)
        var = rv.astype(jnp.float32)
        ret_mean, ret_var = mean, var
        if track:
            # tracking warmup: return this batch's own cross-shard moments
            # (stop-gradient — a non-gradient EMA side channel) while the
            # forward stays frozen-normalised
            sg = jax.lax.stop_gradient(a)
            axes = (axis,) if batch_axis is None else (axis, batch_axis)
            cnt = jnp.asarray(b_global * n_global * a.shape[3], jnp.float32)
            ret_mean = jax.lax.psum(jnp.sum(sg, axis=(0, 2, 3)), axes) / cnt
            sq = jax.lax.psum(jnp.sum(jnp.square(sg), axis=(0, 2, 3)),
                              axes) / cnt
            ret_var = jnp.maximum(sq - jnp.square(ret_mean), 0.0)
    a = ((a - mean[None, :, None, None])
         * jax.lax.rsqrt(var + eps)[None, :, None, None]
         * bn_scale.astype(jnp.float32)[None, :, None, None]
         + bn_bias.astype(jnp.float32)[None, :, None, None])
    if reatten_scale != 1.0:
        a = a * reatten_scale
    out = jnp.einsum("bhnm,bhmd->bhnd", a.astype(v_full.dtype), v_full)
    b, h, n, dh = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * dh), ret_mean, ret_var


def sequence_parallel_reattention_train(
    q: jnp.ndarray,          # (B, H, N, dh), pre-scaled by qk_scale
    k: jnp.ndarray,          # (B, H, N, dh)
    v: jnp.ndarray,          # (B, H, N, dh)
    mix_kernel: jnp.ndarray,  # (H, H) raw 1x1 head-mix conv kernel [h_in, h_out]
    mix_bias: jnp.ndarray,    # (H,)
    bn_scale: jnp.ndarray,    # (H,)
    bn_bias: jnp.ndarray,     # (H,)
    mesh: Mesh,
    dropout_rng: Optional[jax.Array] = None,
    rate: float = 0.0,
    axis: str = "model",
    data_axis: Optional[str] = "data",
    eps: float = 1e-5,
    reatten_scale: float = 1.0,
    running_stats: Optional[tuple] = None,  # (mean, var): normalise with
                                            # these instead of batch stats
    use_flash: bool = False,
    interpret: Optional[bool] = None,
    track_stats: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training-mode sequence-parallel re-attention.

    Differentiable through shard_map (grads psum across shards where the
    stats/gathers require it).  Returns ``(out, mean, var)``; with batch
    statistics (``running_stats=None``) the stats are replicated and exactly
    equal the unsharded BatchNorm's, so the caller can apply the
    running-average update.

    ``use_flash`` runs the fused rectangular train kernels per shard —
    the frozen-stats kernel when ``running_stats`` is given, the exact
    batch-stats bn kernel (cross-shard psum'd moments and gradients)
    otherwise.

    ``track_stats`` (requires ``running_stats``): the tracking-BN warmup
    mode — the forward stays frozen-normalised, but the returned
    ``(mean, var)`` are this batch's OWN cross-shard moments (stop-gradient
    stats sweep; with ``use_flash``, a ``flash_bn_batch_moments`` pass with
    the same in-kernel dropout seed as the forward), exactly equal to the
    unsharded tracking moments — so the caller's running-average EMA
    converges toward batch statistics ahead of a flip to exact semantics.
    """
    b, _, n, _ = q.shape
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"token count {n} not divisible by mesh axis "
                         f"{axis!r} of size {size}")
    if rate > 0.0 and dropout_rng is None:
        raise ValueError("attention dropout needs dropout_rng")
    ba = _batch_spec(mesh, data_axis, b)
    tok = P(ba, None, axis, None)
    seed = jax.random.key_data(
        dropout_rng if dropout_rng is not None else jax.random.key(0))
    use_batch_stats = running_stats is None
    if track_stats and use_batch_stats:
        raise ValueError("track_stats needs running_stats (the tracking "
                         "warmup normalises with the frozen averages)")
    heads = mix_bias.shape[0]
    rm, rv = (running_stats if running_stats is not None
              else (jnp.zeros((heads,)), jnp.ones((heads,))))
    if interpret is None:
        interpret = mesh.devices.reshape(-1)[0].platform != "tpu"
    fn = jax.shard_map(
        partial(_local_reattention_train, axis=axis, batch_axis=ba,
                rate=rate, eps=eps, reatten_scale=reatten_scale,
                use_batch_stats=use_batch_stats, n_global=n, b_global=b,
                use_flash=use_flash, interpret=interpret,
                track=track_stats),
        mesh=mesh,
        in_specs=(tok, tok, tok, P(None, None), P(None), P(None), P(None),
                  P(None), P(None), P(None)),
        out_specs=(P(ba, axis, None), P(None), P(None)),
        # pallas_call (use_flash) doesn't annotate varying-mesh-axes
        # metadata on its outputs; the specs above already pin the sharding
        check_vma=False,
    )
    return fn(q, k, v, mix_kernel, mix_bias, bn_scale, bn_bias, rm, rv, seed)
