"""Patch encoders, both reference flavours.

* ``PatchEncoder`` (torch flavour, notebook ``ViT_UNet.ipynb`` cell 16):
  optional conv/fourier preprocessing on the image, patchify at the *finest*
  hierarchy level (patch_size / 2^depth), add a learned position embedding
  over the fine tokens, then regroup fine patches into the coarse entry-level
  patches.  The reference's regrouping unpatch->re-patch round trip is the
  single relayout ``change_patch_size(up_factor=2**depth)`` here.
* ``PatchEncoderCL`` (TF flavour, ``tf/functions.py:135-160``): patchify at
  the coarsest level (channels-last) and apply a learned Dense projection +
  position embedding.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.ops.patches import (
    change_patch_size,
    flatten_patches,
    patchify,
    patchify_cl,
)


class PatchEncoder(nn.Module):
    depth: int
    num_patches: int          # token count at the coarse (entry) level
    patch_size: int           # coarse patch size
    num_channels: int = 3
    preprocessing: str = "conv"  # 'conv' | 'fourier' | 'none'
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.preprocessing in ("conv", "fourier", "none")
        patch_size_final = self.patch_size // 2 ** self.depth
        num_patches_final = self.num_patches * 4 ** self.depth
        if self.preprocessing == "conv":
            nhwc = x.transpose(0, 2, 3, 1)
            nhwc = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="conv2d")(nhwc)
            x = nhwc.transpose(0, 3, 1, 2)
        elif self.preprocessing == "fourier":
            x = jnp.fft.fft2(x).real.astype(self.dtype)
        flat = flatten_patches(patchify(x, patch_size_final))
        pos = nn.Embed(num_patches_final,
                       self.num_channels * patch_size_final ** 2,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="position_embedding")(jnp.arange(num_patches_final))
        encoded = flat + pos
        return change_patch_size(encoded, self.num_channels,
                                 up_factor=2 ** self.depth)


class PatchEncoderCL(nn.Module):
    """TF-flavour patch encoder: Dense projection + position embedding
    (tf/functions.py:135-160).  Input/outputs are channels-last."""

    img_size: int
    patch_size: int
    num_channels: int = 3
    projection_dim: int | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_patches = (self.img_size // self.patch_size) ** 2
        proj_dim = self.projection_dim or self.num_channels * self.patch_size ** 2
        flat = patchify_cl(x, self.patch_size).reshape(
            x.shape[0], num_patches, -1)
        proj = nn.Dense(proj_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="projection")(flat)
        pos = nn.Embed(num_patches, proj_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="position_embedding")(jnp.arange(num_patches))
        return proj + pos
