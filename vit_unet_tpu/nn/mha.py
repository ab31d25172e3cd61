"""Keras-compatible multi-head attention (for the TF-flavour model path).

Functional equivalent of ``tf.keras.layers.MultiHeadAttention`` as used by the
reference's default (``original_attn=True``) encoder blocks
(``tf/functions.py:290-295``) and skip connections (``tf/functions.py:391-395``):
separate q/k/v projections to (heads, key_dim) with bias, scores scaled by
``key_dim**-0.5``, softmax over keys, dropout, then an output projection back
to the query feature size.  Note keras's ``key_dim`` here is the FULL
projection dim per head (the reference passes ``key_dim=projection_dim``), so
the internal width is ``num_heads * projection_dim`` — reproduced faithfully.

``use_flash=True`` runs the attention core on the fused flash kernels with an
IDENTITY head-mix affine (plain softmax attention is re-attention with
m_eff = I, c_eff = 0): the (N_q, N_k) score/probability map never touches
HBM.  Cross-attention (the UNet skip connections, query rows != key rows) is
the rectangular kernel case.  Eval uses the inference kernel; training uses
the custom-VJP train kernel with in-kernel TPU-PRNG dropout (statistically
identical to, but a different stream than, flax's threefry dropout — the
same documented semantics as ``ReAttention(flash_train=True)``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class KerasMHA(nn.Module):
    num_heads: int
    key_dim: int
    value_dim: Optional[int] = None
    dropout: float = 0.0
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _flash_ok(self, n_q: int, n_k: int) -> bool:
        """Same validated kernel envelope + token floor as ReAttention."""
        if self.num_heads <= 8:
            ok = self.key_dim <= 384
        else:
            ok = self.num_heads <= 16 and self.key_dim <= 48
        return ok and max(n_q, n_k) >= 128

    @nn.compact
    def __call__(self, query, value, key=None, *, deterministic: bool = True):
        if key is None:
            key = value
        v_dim = self.value_dim or self.key_dim
        out_features = query.shape[-1]
        dense = lambda feats, name: nn.DenseGeneral(
            features=feats, axis=-1, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        q = dense((self.num_heads, self.key_dim), "query")(query)
        k = dense((self.num_heads, self.key_dim), "key")(key)
        v = dense((self.num_heads, v_dim), "value")(value)

        n_q, n_k = q.shape[1], k.shape[1]
        if (self.use_flash and v_dim == self.key_dim
                and self._flash_ok(n_q, n_k)):
            ctx = self._flash_core(q, k, v, deterministic=deterministic)
        else:
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                preferred_element_type=self.dtype)
            scores = scores * (self.key_dim ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout)(probs,
                                             deterministic=deterministic)
            ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                             preferred_element_type=self.dtype)
        out = nn.DenseGeneral(features=out_features, axis=(-2, -1),
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="out")(ctx)
        return out

    def _flash_core(self, q, k, v, *, deterministic: bool):
        from vit_unet_tpu.kernels.flash_reattention import (
            expand_reattention_affine, flash_reattention, pick_flash_block)
        from vit_unet_tpu.kernels.flash_reattention_train import (
            flash_reattention_train)
        from vit_unet_tpu.nn.reattention import ReAttention

        batch, n_q, heads, dk = q.shape
        n_k = k.shape[1]
        qh = q.transpose(0, 2, 1, 3) * (self.key_dim ** -0.5)
        kh = k.transpose(0, 2, 1, 3)
        v_cat = v.reshape(batch, n_k, heads * dk)
        blk = pick_flash_block(n_q, n_k, num_heads=heads, dh=dk)
        interpret = ReAttention._interpret(qh, kh, v_cat)
        eye = jnp.eye(heads, dtype=jnp.float32)
        zero = jnp.zeros((heads,), jnp.float32)
        if deterministic:
            w, b = expand_reattention_affine(eye, zero, dh=dk)
            ctx = flash_reattention(qh.astype(self.dtype),
                                    kh.astype(self.dtype), v_cat, w, b,
                                    num_heads=heads, block_q=blk, block_k=blk,
                                    interpret=interpret)
        else:
            rate = float(self.dropout)
            if rate > 0.0:
                if not self.has_rng("dropout"):
                    raise ValueError(
                        "flash attention dropout needs an rng: pass "
                        "rngs={'dropout': key} to apply() (dropout="
                        f"{self.dropout})")
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            ctx = flash_reattention_train(
                qh.astype(self.dtype), kh.astype(self.dtype), v_cat,
                eye, zero, seed, heads, rate, blk, blk, interpret)
        return ctx.reshape(batch, n_q, heads, dk)
