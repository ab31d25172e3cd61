"""Transformer MLP (reference: torch/model.py:95-110, tf/functions.py:163-182)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FeedForward(nn.Module):
    """Dense(hidden) -> GELU -> Drop -> Dense(proj) -> [GELU] -> Drop.

    ``final_gelu=True`` reproduces the TF flavour's extra activation after the
    second Dense (``tf/functions.py:180``); the torch flavour has none
    (``torch/model.py:102-108``).  GELU is the exact (erf) form, matching
    ``torch.nn.GELU`` defaults.
    """

    projection_dim: int
    hidden_dim: int
    dropout: float = 0.0
    final_gelu: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, name="drop1")(x, deterministic=deterministic)
        x = nn.Dense(self.projection_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        if self.final_gelu:
            x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, name="drop2")(x, deterministic=deterministic)
        return x
