"""HViT-UNet, TF-notebook orientation — the reference's actual TPU model.

Rebuilds ``/root/reference/vit_unet/tf/model.py:9-209`` TPU-natively:
channels-last images, Dense patch projection, an *ascending* patch-size list
(so the encoder MERGES patches going down: tokens 256 -> 64 -> 16 at 128²),
keras-style MHA blocks by default (``original_attn=True``), Resampling layers
between levels, pure-MHA skip connections, and a global residual output
``Y = X + unpatch(decoded)`` (tf/model.py:208).

Reference defects designed around (SURVEY.md §2.5): the bottleneck is built
at ``projection_dim[-1]`` (the reference reads a stale loop variable at
tf/model.py:106,119 — harmless for the default path, wrong for re-attention;
we use the correct level) and the ``conv`` resampling mode is permitted here
(the reference's own assert excludes it despite implementing it).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.nn.blocks import TFTransformerEncoder
from vit_unet_tpu.nn.mha import KerasMHA
from vit_unet_tpu.nn.patch_encoder import PatchEncoderCL
from vit_unet_tpu.nn.resampling import Resampling
from vit_unet_tpu.ops.patches import unpatchify_cl


@dataclasses.dataclass(frozen=True)
class HViTUNetTFConfig:
    """Constructor surface of the TF reference (tf/model.py:10-24)."""

    img_size: int = 128
    patch_size: tuple = (8, 16, 32)          # strictly increasing
    projection_dim: int | None = None        # None -> C*p² per level
    num_channels: int = 3
    num_heads: int = 8
    transformer_layers: tuple = (4, 4)
    size_bottleneck: int = 4
    hidden_unit_factor: float = 2.0
    drop_attn: float = 0.2
    drop_proj: float = 0.2
    drop_linear: float = 0.4
    resampling_type: str = "standard"        # 'max' | 'avg' | 'standard' | 'conv'
    original_attn: bool = True
    use_flash: bool = False   # fused flash kernels: ReAttention when
                              # original_attn=False, KerasMHA (identity
                              # head-mix) + rectangular skip cross-attn
                              # when original_attn=True
    flash_train: bool = False # extra flag for the ReAttention path ONLY
                              # (original_attn=False): route its train-mode
                              # forward/backward through the custom-VJP
                              # kernels too.  The keras-MHA path
                              # (original_attn=True) needs no extra flag —
                              # use_flash alone already runs *training*
                              # on the train kernel with in-kernel TPU-PRNG
                              # dropout (nn/mha.py KerasMHA._flash_core).
    residual_gain: bool = False  # framework extension (not reference
                                 # parity): zero-init learned per-channel
                                 # gain g on the global-residual branch,
                                 # Y = X + g * unpatch(decoded).  Output
                                 # starts exactly at the identity the plain
                                 # residual (tf/model.py:208) dies into;
                                 # any learned correction is pure gain.
    dtype: str = "float32"
    param_dtype: str = "float32"

    def __post_init__(self):
        ps = list(self.patch_size)
        if any(self.img_size % p for p in ps):
            raise ValueError("patch sizes must divide image size")
        if any(ps[i] >= ps[i + 1] for i in range(len(ps) - 1)):
            raise ValueError("patch sizes must be strictly increasing")
        if self.resampling_type in ("max", "avg") and self.projection_dim is None:
            raise ValueError("projection_dim required for max/avg resampling")
        if self.projection_dim is not None:
            want = self.num_channels * ps[0] ** 2
            if self.projection_dim != want:
                # the global-residual unpatch (tf/model.py:208) requires the
                # level-0 projection to be exactly C*patch_size[0]^2
                raise ValueError(
                    f"projection_dim must be num_channels*patch_size[0]^2 = "
                    f"{want} for the residual output to reassemble an image")
        if self.resampling_type == "standard" and self.projection_dim is not None:
            raise ValueError("projection_dim is auto-computed for 'standard'")

    @property
    def num_patches(self) -> list[int]:
        return [(self.img_size // p) ** 2 for p in self.patch_size]

    @property
    def projection_dims(self) -> list[int]:
        if self.projection_dim is not None:
            return [self.projection_dim] * len(self.patch_size)
        return [self.num_channels * p ** 2 for p in self.patch_size]

    @property
    def hidden_units(self) -> list[int]:
        return [int(self.hidden_unit_factor * d) for d in self.projection_dims]


class HViTUNetTF(nn.Module):
    config: HViTUNetTFConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        """(B, H, W, C) channels-last -> same shape (global residual)."""
        cfg = self.config
        dt, pdt = jnp.dtype(cfg.dtype), jnp.dtype(cfg.param_dtype)
        ps = list(cfg.patch_size)
        ps_rev = ps[::-1]
        n_levels = len(ps) - 1
        proj = cfg.projection_dims
        hidden = cfg.hidden_units
        kw = dict(deterministic=deterministic,
                  use_running_average=use_running_average)

        def encoder_stack(level: int, layers: int, name: str):
            return TFTransformerEncoder(
                num_patches=cfg.num_patches[level],
                projection_dim=proj[level], hidden_dim=hidden[level],
                num_heads=cfg.num_heads, num_layers=layers,
                num_channels=cfg.num_channels, attn_drop=cfg.drop_attn,
                proj_drop=cfg.drop_proj, original_attn=cfg.original_attn,
                use_flash=cfg.use_flash, flash_train=cfg.flash_train,
                dtype=dt, param_dtype=pdt, name=name)

        h = PatchEncoderCL(img_size=cfg.img_size, patch_size=ps[0],
                           num_channels=cfg.num_channels,
                           projection_dim=(cfg.projection_dim or
                                           cfg.num_channels * ps[0] ** 2),
                           dtype=dt, param_dtype=pdt, name="PE")(x)

        skips = []
        for i in range(n_levels):
            h = encoder_stack(i, cfg.transformer_layers[i], f"Encoder_{i}")(h, **kw)
            skips.append(h)
            h = Resampling(img_size=cfg.img_size, patch_size=ps[i:i + 2],
                           num_channels=cfg.num_channels,
                           projection_dim=(cfg.projection_dim
                                           if cfg.resampling_type != "standard"
                                           else None),
                           resampling_type=cfg.resampling_type,
                           dtype=dt, param_dtype=pdt, name=f"Encoder_RS_{i}")(h)

        h = encoder_stack(len(ps) - 1, cfg.size_bottleneck, "BottleNeck")(h, **kw)

        skips = skips[::-1]
        for i in range(n_levels):
            lvl = len(ps) - (i + 2)  # decoder target level
            h = Resampling(img_size=cfg.img_size, patch_size=ps_rev[i:i + 2],
                           num_channels=cfg.num_channels,
                           projection_dim=(cfg.projection_dim
                                           if cfg.resampling_type != "standard"
                                           else None),
                           resampling_type=cfg.resampling_type,
                           dtype=dt, param_dtype=pdt, name=f"Decoder_RS_{i}")(h)
            h = encoder_stack(lvl, cfg.transformer_layers[lvl], f"Decoder_{i}")(h, **kw)
            # skip fusion: plain keras MHA(query=encoder skip, value=decoder)
            # (tf/functions.py:371-395, call at tf/model.py:206)
            h = KerasMHA(num_heads=cfg.num_heads, key_dim=proj[lvl],
                         value_dim=proj[lvl], dropout=cfg.drop_attn,
                         use_flash=cfg.use_flash,
                         dtype=dt, param_dtype=pdt,
                         name=f"SkipConnection_{i}")(
                             skips[i], h, deterministic=deterministic)

        out = unpatchify_cl(h, cfg.num_channels).astype(x.dtype)
        if cfg.residual_gain:
            g = self.param("residual_gain", nn.initializers.zeros,
                           (cfg.num_channels,), pdt)
            return x + g.astype(x.dtype)[None, None, None, :] * out
        return x + out


def get_hvit_unet_tf(**overrides) -> HViTUNetTF:
    return HViTUNetTF(HViTUNetTFConfig(**overrides))
