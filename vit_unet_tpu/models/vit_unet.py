"""ViT-UNet — hierarchical Vision-Transformer autoencoder, TPU-native.

Canonical (torch-flavour) assembly following ``ViT_UNet.ipynb`` cell 44 /
``torch/model.py:263-435``: patch-encode, ``depth`` levels of ``depth_te``
re-attention blocks with patch-size *fluctuation* (split patches going down:
tokens x4, features /4), a transformer bottleneck, a mirrored decoder, and
cross-attention skip connections from encoder level i to decoder level
depth-i.  All resampling is zero-cost relayout; the whole forward is one
jitted XLA graph.

Defaults (``qkv_kernel=3``, ``ln_mode='shared'``) are the unique semantics
reproducing the README parameter counts (3,387,568 / 36,613,036 / 63,043,866
— README.md:16,34,52); ``qkv_kernel=1`` reproduces the 512² notebook config
(50,345,433, ViT_UNet.ipynb cell 46).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.nn.blocks import FourierEncoderBlock, ReAttentionEncoderBlock
from vit_unet_tpu.nn.patch_encoder import PatchEncoder
from vit_unet_tpu.nn.reattention import SkipConnection
from vit_unet_tpu.ops.patches import merge_patches, split_patches, unpatchify


@dataclasses.dataclass(frozen=True)
class ViTUNetConfig:
    """Constructor surface of the reference model (README.md:18-67)."""

    depth: int = 2
    depth_te: int = 2
    size_bottleneck: int = 2
    preprocessing: str = "conv"      # 'conv' | 'fourier' | 'none'
    im_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    hidden_dim: int = 128
    num_heads: int = 8
    attn_drop: float = 0.2
    proj_drop: float = 0.2
    linear_drop: float = 0.0
    # framework extensions
    qkv_kernel: int = 3              # 3 = packaged/README, 1 = notebook 512²
    ln_mode: str = "shared"          # 'shared' (README counts) | 'dual'
    block_type: str = "reattention"  # 'reattention' | 'fourier' (FNet variant,
                                     # FformerEncoder — ViT_UNet.ipynb cell 24)
    remat: bool = False              # jax.checkpoint each encoder block:
                                     # recompute activations in backward instead
                                     # of storing N² attention residuals in HBM
    out_channels: Optional[int] = None  # output channels (default: input C);
                                     # e.g. 1 for segmentation masks — the
                                     # README's soft-Dice task (README.md:89-102)
                                     # that the reference never wired up
    global_residual: bool = False    # Y = X + decoded, the TF variant's
                                     # output form (tf/model.py:208) — makes
                                     # restoration start from identity
    residual_gain: bool = False      # framework extension (not reference
                                     # parity): zero-init learned per-channel
                                     # gain g on the residual branch,
                                     # Y = X + g * decoded.  Output starts
                                     # exactly at identity (the attractor the
                                     # plain residual dies into — see
                                     # CONVERGENCE.json / docs/PERF.md) and
                                     # any learned correction is pure PSNR
                                     # gain; requires global_residual
    input_skip: bool = False         # framework extension (not reference
                                     # parity): concatenate the raw input
                                     # with the decoded feature map before
                                     # the output conv.  The output head
                                     # then has direct pixel access, so
                                     # local corrections (denoising is one)
                                     # need not survive the patch-attention
                                     # trunk, whose measured reconstruction
                                     # error exceeds typical noise power —
                                     # the mechanism behind the identity
                                     # attractor (CONVERGENCE.json,
                                     # docs/PERF.md "End-to-end training
                                     # behavior")
    head_blocks: int = 0             # framework extension (not reference
                                     # parity): number of (Conv 3x3
                                     # head_dim, GELU) blocks inserted
                                     # before the output conv.  With the
                                     # default single 3x3 output conv the
                                     # strongest pixel-local operator the
                                     # head can express is ONE linear 3x3
                                     # filter — tools/denoise_probe.py
                                     # measured that ceiling at ~+0.7 dB on
                                     # the SIDD recreation.  A short
                                     # nonlinear conv stack lets the head
                                     # compute content-adaptive local
                                     # corrections (gated by the trunk's
                                     # context features when combined with
                                     # input_skip) without touching the
                                     # attention trunk
    head_dim: int = 32               # width of the head_blocks convs
    use_flash: bool = False          # Pallas fused attention path (eval)
    flash_train: bool = False        # ...and in training: in-kernel attn
                                     # dropout, exact batch-stats BN head-mix
                                     # (see kernels/ docstrings)
    flash_frozen_bn: bool = False    # fast training mode: freeze the head-
                                     # mix BN at running stats (~10-20% faster,
                                     # no running-average updates)
    bn_track: bool = False           # tracking train mode: normalise with
                                     # running stats, update them toward each
                                     # batch's moments — the warmup that makes
                                     # a later flip to exact batch-stats BN a
                                     # continuous change (nn/reattention.py
                                     # bn_track; Fitter(bn_warmup='track'))
    attn_bn_eps: float = 1e-5        # head-mix BatchNorm eps.  1e-5 = torch
                                     # reference parity (never trained there);
                                     # 1e-3 (Keras default, the reference's
                                     # trained TF variant) makes exact-BN
                                     # training stable — docs/PERF.md
    sequence_parallel: bool = False  # shard the token axis of long fine-level
                                     # sequences over the mesh 'model' axis,
                                     # all-gathering K/V over ICI per layer
                                     # (parallel/sequence.py) — the TPU-native
                                     # long-context capability (SURVEY.md §5);
                                     # pass the mesh via ViTUNet(cfg, mesh=...)
    sp_min_tokens: int = 1024        # apply SP only at levels with >= this
                                     # many tokens (coarse levels don't pay)
    dtype: str = "float32"
    param_dtype: str = "float32"

    def __post_init__(self):
        if self.patch_size % 2 ** self.depth:
            raise ValueError("depth incompatible: 2^depth must divide patch_size")
        if self.patch_size // 2 ** self.depth < 4:
            raise ValueError("depth too large: final patch size < 4")
        if self.im_size % self.patch_size:
            raise ValueError("patch_size must divide im_size")
        if self.block_type not in ("reattention", "fourier"):
            raise ValueError("block_type must be 'reattention' or 'fourier'")
        if (self.global_residual and self.out_channels
                and self.out_channels != self.num_channels):
            raise ValueError(
                "global_residual requires out_channels == num_channels")
        if self.residual_gain and not self.global_residual:
            raise ValueError("residual_gain requires global_residual=True")
        if (self.preprocessing == "fourier" and self.out_channels
                and self.out_channels != self.num_channels):
            raise ValueError(
                "preprocessing='fourier' replaces the output with ifft2 of "
                "the input (reference quirk, torch/model.py:429-430) and is "
                "incompatible with out_channels != num_channels")

    @property
    def num_patches(self) -> int:
        return (self.im_size // self.patch_size) ** 2

    @property
    def projection_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2

    def level_geometry(self, level: int) -> dict:
        """Patch/token/feature sizes at hierarchy level (torch/model.py:301-307)."""
        return dict(
            patch_size=self.patch_size // 2 ** level,
            num_patches=self.num_patches * 4 ** level,
            projection_dim=self.projection_dim // 4 ** level,
            hidden_dim=self.hidden_dim // 2 ** level,
        )


class ViTUNet(nn.Module):
    config: ViTUNetConfig
    # mesh for sequence parallelism (config.sequence_parallel=True); when
    # None the ambient abstract mesh is used if one is active
    mesh: Optional[jax.sharding.Mesh] = None

    def setup(self):
        cfg = self.config
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        self.PE = PatchEncoder(
            depth=cfg.depth, num_patches=cfg.num_patches,
            patch_size=cfg.patch_size, num_channels=cfg.num_channels,
            preprocessing=cfg.preprocessing, dtype=dt, param_dtype=pdt)

        block_cls = ReAttentionEncoderBlock
        fourier_cls = FourierEncoderBlock
        if cfg.remat:
            # deterministic/use_running_average are trace-time bools ->
            # static; only x is differentiated/recomputed.
            block_cls = nn.remat(block_cls, static_argnums=(2, 3))
            fourier_cls = nn.remat(fourier_cls, static_argnums=(2, 3))

        def block(level: int):
            g = cfg.level_geometry(level)
            if cfg.block_type == "fourier":
                return fourier_cls(
                    num_patches=g["num_patches"],
                    projection_dim=g["projection_dim"],
                    hidden_dim=g["hidden_dim"], linear_drop=cfg.linear_drop,
                    dtype=dt, param_dtype=pdt)
            return block_cls(
                num_patches=g["num_patches"], projection_dim=g["projection_dim"],
                hidden_dim=g["hidden_dim"], num_heads=cfg.num_heads,
                num_channels=cfg.num_channels, attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop, linear_drop=cfg.linear_drop,
                qkv_kernel=cfg.qkv_kernel, ln_mode=cfg.ln_mode,
                use_flash=cfg.use_flash, flash_train=cfg.flash_train,
                flash_frozen_bn=cfg.flash_frozen_bn, bn_track=cfg.bn_track,
                bn_eps=cfg.attn_bn_eps,
                sequence_parallel=cfg.sequence_parallel, sp_mesh=self.mesh,
                sp_min_tokens=cfg.sp_min_tokens,
                dtype=dt, param_dtype=pdt)

        self.Encoders = [block(lvl)
                         for lvl in range(cfg.depth)
                         for _ in range(cfg.depth_te)]
        self.BottleNeck = [block(cfg.depth) for _ in range(cfg.size_bottleneck)]
        self.Decoders = [block(cfg.depth - lvl)
                         for lvl in range(cfg.depth)
                         for _ in range(cfg.depth_te)]
        self.SkipConnections = [
            SkipConnection(
                dim=cfg.projection_dim // 4 ** (cfg.depth - lvl - 1),
                num_channels=cfg.num_channels, num_heads=cfg.num_heads,
                qkv_kernel=cfg.qkv_kernel, attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop, use_flash=cfg.use_flash,
                flash_train=cfg.flash_train,
                flash_frozen_bn=cfg.flash_frozen_bn, bn_track=cfg.bn_track,
                bn_eps=cfg.attn_bn_eps,
                sequence_parallel=cfg.sequence_parallel, sp_mesh=self.mesh,
                sp_min_tokens=cfg.sp_min_tokens, dtype=dt, param_dtype=pdt)
            for lvl in range(cfg.depth)]
        out_ch = cfg.out_channels or cfg.num_channels
        if cfg.head_blocks:
            self.head = [nn.Conv(cfg.head_dim, (3, 3), padding="SAME",
                                 dtype=dt, param_dtype=pdt)
                         for _ in range(cfg.head_blocks)]
        if (cfg.preprocessing == "conv" or out_ch != cfg.num_channels
                or cfg.input_skip or cfg.head_blocks):
            self.conv2d = nn.Conv(out_ch, (3, 3), padding="SAME",
                                  dtype=dt, param_dtype=pdt)
        if cfg.residual_gain:
            # zero-init per-channel gain on the residual branch (framework
            # extension — see ViTUNetConfig.residual_gain)
            self.res_gain = self.param(
                "residual_gain", nn.initializers.zeros, (out_ch,), pdt)

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        """(B, C, H, W) -> (B, C, im_size, im_size)."""
        cfg = self.config
        if x.shape[-1] != cfg.im_size or x.shape[-2] != cfg.im_size:
            # torchvision Resize equivalent (torch/model.py:376): bilinear
            x = jax.image.resize(
                x, (*x.shape[:2], cfg.im_size, cfg.im_size), method="bilinear")
        x = x.astype(jnp.dtype(cfg.dtype))
        kw = dict(deterministic=deterministic,
                  use_running_average=use_running_average)

        h = self.PE(x)
        skips = []
        for i, enc in enumerate(self.Encoders):
            h = enc(h, deterministic, use_running_average)
            if (i + 1) % cfg.depth_te == 0:
                skips.append(h)
                h = split_patches(h, cfg.num_channels)
        for bott in self.BottleNeck:
            h = bott(h, deterministic, use_running_average)
        for i, dec in enumerate(self.Decoders):
            h = dec(h, deterministic, use_running_average)
            if (i + 1) % cfg.depth_te == 0:
                lvl = (i + 1) // cfg.depth_te
                h = merge_patches(h, cfg.num_channels)
                # skip index conventions (torch/model.py:418 vs notebook cell
                # 44) coincide for all shipped configs; packaged convention.
                h = self.SkipConnections[lvl - 1](
                    skips[cfg.depth - lvl], h, h, **kw)

        out = unpatchify(h, cfg.num_channels)
        out_ch = cfg.out_channels or cfg.num_channels
        if cfg.input_skip:
            out = jnp.concatenate([out, x], axis=1)
        if (cfg.preprocessing == "conv" or out_ch != cfg.num_channels
                or cfg.input_skip or cfg.head_blocks):
            out = out.transpose(0, 2, 3, 1)
            for conv in (self.head if cfg.head_blocks else ()):
                out = nn.gelu(conv(out))
            out = self.conv2d(out).transpose(0, 3, 1, 2)
        if cfg.global_residual:
            if cfg.residual_gain:
                g = self.res_gain.astype(out.dtype)[None, :, None, None]
                out = x.astype(out.dtype) + g * out
            else:
                out = x + out
        elif cfg.preprocessing == "fourier":
            # reference quirk (torch/model.py:429-430): ifft2 of the *input*
            out = jnp.fft.ifft2(x, norm="ortho").real.astype(out.dtype)
        return out


# --- registry (torch/model.py:438-486 presets, README.md:16-68) ---

PRESETS: dict[str, dict] = {
    "lite": dict(depth=2, depth_te=1, size_bottleneck=2, preprocessing="conv",
                 im_size=224, patch_size=16, num_channels=3, hidden_dim=64,
                 num_heads=4, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
    "base": dict(depth=2, depth_te=2, size_bottleneck=2, preprocessing="conv",
                 im_size=224, patch_size=32, num_channels=3, hidden_dim=128,
                 num_heads=8, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
    "large": dict(depth=2, depth_te=4, size_bottleneck=4, preprocessing="conv",
                  im_size=224, patch_size=32, num_channels=3, hidden_dim=128,
                  num_heads=8, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
    # the notebook 512² prototype (ViT_UNet.ipynb cell 45)
    "notebook512": dict(depth=2, depth_te=2, size_bottleneck=1,
                        preprocessing="conv", im_size=512, patch_size=32,
                        num_channels=3, hidden_dim=256, num_heads=8,
                        attn_drop=0.2, proj_drop=0.2, linear_drop=0.0,
                        qkv_kernel=1),
}


def get_config(name: str, **overrides) -> ViTUNetConfig:
    if name.lower() not in PRESETS:
        raise ValueError(f"model string {name!r} not valid; "
                         f"choose from {sorted(PRESETS)}")
    return ViTUNetConfig(**{**PRESETS[name.lower()], **overrides})


def get_vit_unet(name: str, mesh=None, **overrides) -> ViTUNet:
    """Name -> model factory mirroring ``get_vit_unet`` (torch/model.py:438).

    ``mesh`` (a jax.sharding.Mesh with a 'model' axis) enables the
    sequence-parallel path when combined with ``sequence_parallel=True``.
    """
    return ViTUNet(get_config(name, **overrides), mesh=mesh)
