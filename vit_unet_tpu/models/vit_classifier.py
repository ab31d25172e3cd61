"""Hierarchical ViT classifier — the TPU classification model family.

The reference drives ``ViT_classifier(depth=2, depth_te=4, linear_list=[64,4],
preprocessing='conv', num_patches=64, patch_size=16, num_channels=3,
hidden_dim=128, num_heads=16, attn_drop=.2, proj_drop=.2, linear_drop=.2)``
on 224² inputs inside ``TPUStrategy`` (``TPUs_in_Colab.ipynb`` cell 27); the
class itself lives in the author's sibling repo (``deep_vit_macula``), so
only the constructor surface and the training recipe (categorical
cross-entropy ``from_logits=True, label_smoothing=.05``, acc/F1 metrics —
cells 26-27) are normative.  This rebuild reuses the ViT-UNet encoder
hierarchy (same patch-size-fluctuation semantics as
``models/vit_unet.py``) and ends in a mean-pooled MLP head whose widths are
``linear_list`` (last entry = number of classes, returned as logits).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.nn.blocks import ReAttentionEncoderBlock
from vit_unet_tpu.nn.patch_encoder import PatchEncoder
from vit_unet_tpu.ops.patches import split_patches


@dataclasses.dataclass(frozen=True)
class ViTClassifierConfig:
    """Constructor surface of TPUs_in_Colab.ipynb cell 27."""

    depth: int = 2
    depth_te: int = 4
    linear_list: Sequence[int] = (64, 4)
    preprocessing: str = "conv"
    num_patches: int = 64
    patch_size: int = 16
    num_channels: int = 3
    hidden_dim: int = 128
    num_heads: int = 16
    attn_drop: float = 0.2
    proj_drop: float = 0.2
    linear_drop: float = 0.2
    # framework extensions (same semantics as ViTUNetConfig)
    qkv_kernel: int = 3
    ln_mode: str = "shared"
    use_flash: bool = False
    flash_train: bool = False
    flash_frozen_bn: bool = False
    dtype: str = "float32"
    param_dtype: str = "float32"

    def __post_init__(self):
        if self.patch_size % 2 ** self.depth:
            raise ValueError("depth incompatible: 2^depth must divide patch_size")
        side = round(self.num_patches ** 0.5)
        if side * side != self.num_patches:
            raise ValueError("num_patches must be a perfect square")
        if not self.linear_list:
            raise ValueError("linear_list needs at least the class count")

    @property
    def im_size(self) -> int:
        return self.patch_size * round(self.num_patches ** 0.5)

    @property
    def projection_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2

    @property
    def num_classes(self) -> int:
        return int(self.linear_list[-1])


class ViTClassifier(nn.Module):
    config: ViTClassifierConfig

    def setup(self):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        self.PE = PatchEncoder(
            depth=cfg.depth, num_patches=cfg.num_patches,
            patch_size=cfg.patch_size, num_channels=cfg.num_channels,
            preprocessing=cfg.preprocessing, dtype=dt, param_dtype=pdt)
        self.Encoders = [
            ReAttentionEncoderBlock(
                num_patches=cfg.num_patches * 4 ** lvl,
                projection_dim=cfg.projection_dim // 4 ** lvl,
                hidden_dim=cfg.hidden_dim // 2 ** lvl,
                num_heads=cfg.num_heads, num_channels=cfg.num_channels,
                attn_drop=cfg.attn_drop, proj_drop=cfg.proj_drop,
                linear_drop=cfg.linear_drop, qkv_kernel=cfg.qkv_kernel,
                ln_mode=cfg.ln_mode, use_flash=cfg.use_flash,
                flash_train=cfg.flash_train,
                flash_frozen_bn=cfg.flash_frozen_bn, dtype=dt, param_dtype=pdt)
            for lvl in range(cfg.depth)
            for _ in range(cfg.depth_te)]
        self.Head = [
            nn.Dense(width, dtype=dt, param_dtype=pdt, name=f"head_{i}")
            for i, width in enumerate(cfg.linear_list)]
        self.head_dropout = nn.Dropout(cfg.linear_drop)

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        """(B, C, H, W) -> (B, num_classes) logits."""
        cfg = self.config
        if x.shape[-1] != cfg.im_size or x.shape[-2] != cfg.im_size:
            x = jax.image.resize(
                x, (*x.shape[:2], cfg.im_size, cfg.im_size), method="bilinear")
        x = x.astype(jnp.dtype(cfg.dtype))
        kw = dict(deterministic=deterministic,
                  use_running_average=use_running_average)

        h = self.PE(x)
        for i, enc in enumerate(self.Encoders):
            h = enc(h, **kw)
            if (i + 1) % cfg.depth_te == 0 and (i + 1) < len(self.Encoders):
                h = split_patches(h, cfg.num_channels)
        h = jnp.mean(h, axis=1)                      # global token pool
        for i, dense in enumerate(self.Head):
            h = dense(h)
            if i + 1 < len(self.Head):
                h = jax.nn.gelu(h, approximate=False)
                h = self.head_dropout(h, deterministic=deterministic)
        return h
