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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_reattention(q, k, v, m_eff, c_eff, *, axis: str):
    """Per-shard body under shard_map: q is the local row block (already
    scaled); k/v are local blocks that get all-gathered here."""
    k_full = jax.lax.all_gather(k, axis, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=2, tiled=True)
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
) -> jnp.ndarray:
    """Eval-mode re-attention with the token axis sharded over ``axis``.

    Token count must divide the axis size.  Returns the merged-head
    (B, N, H*dh) output with the same sharding layout as the inputs.
    """
    n = q.shape[2]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"token count {n} not divisible by mesh axis "
                         f"{axis!r} of size {size}")
    tok = P(None, None, axis, None)
    out_spec = P(None, axis, None)
    fn = jax.shard_map(
        partial(_local_reattention, axis=axis),
        mesh=mesh,
        in_specs=(tok, tok, tok, P(None, None), P(None)),
        out_specs=out_spec,
    )
    return fn(q, k, v, m_eff, c_eff)
