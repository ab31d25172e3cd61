"""Keras-compatible multi-head attention (for the TF-flavour model path).

Functional equivalent of ``tf.keras.layers.MultiHeadAttention`` as used by the
reference's default (``original_attn=True``) encoder blocks
(``tf/functions.py:290-295``) and skip connections (``tf/functions.py:391-395``):
separate q/k/v projections to (heads, key_dim) with bias, scores scaled by
``key_dim**-0.5``, softmax over keys, dropout, then an output projection back
to the query feature size.  Note keras's ``key_dim`` here is the FULL
projection dim per head (the reference passes ``key_dim=projection_dim``), so
the internal width is ``num_heads * projection_dim`` — reproduced faithfully.
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
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

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
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=self.dtype)
        scores = scores * (self.key_dim ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                         preferred_element_type=self.dtype)
        out = nn.DenseGeneral(features=out_features, axis=(-2, -1),
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="out")(ctx)
        return out
