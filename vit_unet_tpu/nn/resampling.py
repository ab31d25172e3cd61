"""TF-flavour Resampling layer (``tf/functions.py:60-132``), TPU-native.

Changes the effective patch size between hierarchy levels in the TF model
orientation, in one of four modes, re-adding a position embedding afterwards:

* ``'max'`` / ``'avg'``: pool groups of patches into one.  The reference does
  this as two staged 1-D poolings over the token axis with ``map_fn``
  (tf/functions.py:99-120); here it is a single reshape + reduce over the
  2x...x2 patch neighbourhood (identical result for the square grids the model
  uses).
* ``'standard'``: pure repatching (zero-cost relayout) + Dense + pos-embed
  (tf/functions.py:121-124).
* ``'conv'``: per-channel Conv2D over the patch-grid axes + Dense + pos-embed
  (tf/functions.py:125-132), with the ``map_fn`` over channels replaced by a
  feature-grouped conv.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from einops import rearrange, reduce
from flax import linen as nn

from vit_unet_tpu.ops.patches import change_patch_size_cl, unflatten_cl


class Resampling(nn.Module):
    img_size: int
    patch_size: Sequence[int]     # [from, to]
    num_channels: int = 3
    projection_dim: int | None = None
    resampling_type: str = "standard"   # 'max' | 'avg' | 'standard' | 'conv'
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, encoded: jnp.ndarray) -> jnp.ndarray:
        assert self.resampling_type in ("max", "avg", "standard", "conv")
        p_from, p_to = self.patch_size
        big, small = max(p_from, p_to), min(p_from, p_to)
        if big % small:
            raise ValueError(
                f"patch sizes {self.patch_size} must be integer multiples of "
                "each other — a non-integer resampling ratio has no token "
                "merge/split interpretation")
        n_from = (self.img_size // p_from) ** 2
        n_to = (self.img_size // p_to) ** 2
        pos = lambda dim: nn.Embed(
            n_to, dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="position_embedding")(jnp.arange(n_to))

        if self.resampling_type in ("max", "avg"):
            assert self.projection_dim is not None
            g = self.img_size // p_from
            grid = encoded.reshape(encoded.shape[0], g, g, -1)
            if p_to > p_from:  # merge patches (encoder direction)
                k = p_to // p_from
                op = "max" if self.resampling_type == "max" else "mean"
                out = reduce(grid, "b (r i) (s j) e -> b (r s) e", op, i=k, j=k)
            else:
                # Split direction: the reference computes pool_size 0 here and
                # crashes (tf/functions.py:75,101); we define the natural
                # inverse — nearest-neighbour token upsampling — so max/avg
                # resampling is usable end-to-end.
                k = p_from // p_to
                out = rearrange(
                    jnp.broadcast_to(grid[:, :, None, :, None, :],
                                     (*grid.shape[:2], k, grid.shape[2], k,
                                      grid.shape[-1])),
                    "b r i s j e -> b (r i s j) e")
            return out + pos(self.projection_dim)

        if self.resampling_type == "standard":
            factor = p_to // p_from if p_to > p_from else p_from // p_to
            out = change_patch_size_cl(
                encoded, self.num_channels,
                up_factor=factor if p_to > p_from else 1,
                down_factor=factor if p_to < p_from else 1)
            dim = self.projection_dim or self.num_channels * p_to ** 2
            out = nn.Dense(dim, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="linear")(out)
            return out + pos(dim)

        # 'conv' (tf/functions.py:125-132): a strided Conv2D whose *spatial*
        # dims are the intra-patch pixels and whose channel axis is the token
        # axis (N_from -> N_to filters), applied with shared weights for every
        # image channel.  The reference runs it as map_fn over the batch with
        # the channel axis folded into the conv batch; here both fold at once.
        pats = unflatten_cl(encoded, self.num_channels)   # (B, N, p, p, C)
        b = pats.shape[0]
        x = rearrange(pats, "b n h w c -> (b c) h w n")
        if n_to < n_from:  # merge direction (the reference's only valid one)
            k = n_from // n_to  # the reference's pool_size
            y = nn.Conv(n_to, (k // 2, k // 2), strides=(k // 2, k // 2),
                        padding="SAME", dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
        else:
            # Split direction: undefined in the reference (kernel size 0,
            # tf/functions.py:92); we define the symmetric inverse — a
            # transposed conv growing the intra-patch grid.
            k = n_to // n_from
            y = nn.ConvTranspose(n_to, (k // 2, k // 2),
                                 strides=(k // 2, k // 2), padding="SAME",
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="conv")(x)
        out = rearrange(y, "(b c) h w m -> b m (h w c)", b=b)
        dim = self.projection_dim or self.num_channels * p_to ** 2
        out = nn.Dense(dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="linear")(out)
        return out + pos(dim)
