"""Transformer encoder blocks, both reference flavours.

* ``ReAttentionEncoderBlock`` — canonical torch-flavour block: post-norm with
  a *joint* LayerNorm over (tokens, features) (``torch/model.py:193-196``).
  ``ln_mode='shared'`` applies ONE LayerNorm's weights after both residuals
  (notebook ``ViT_UNet.ipynb`` cell 27 — this is the configuration that
  reproduces the README parameter counts); ``ln_mode='dual'`` uses separate
  LN1/LN2 (packaged ``torch/model.py:193-196``).
* ``TFTransformerEncoder`` — TF-flavour stack of ``num_layers`` blocks with
  standard last-axis LayerNorm, either keras-style MHA (``original_attn=True``,
  ``tf/functions.py:258-311``) or re-attention (``tf/functions.py:314-368``).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.nn.feedforward import FeedForward
from vit_unet_tpu.nn.mha import KerasMHA
from vit_unet_tpu.nn.reattention import ReAttention


class ReAttentionEncoderBlock(nn.Module):
    num_patches: int
    projection_dim: int
    hidden_dim: int
    num_heads: int
    num_channels: int = 3
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    linear_drop: float = 0.0
    qkv_kernel: int = 3
    ln_mode: str = "shared"  # 'shared' (notebook/README) | 'dual' (packaged)
    use_flash: bool = False
    flash_train: bool = False
    flash_frozen_bn: bool = False
    bn_track: bool = False
    sequence_parallel: bool = False
    sp_mesh: Optional[object] = None
    sp_min_tokens: int = 1024
    bn_axis_name: Optional[str] = None
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ReAttn = ReAttention(
            dim=self.projection_dim, num_channels=self.num_channels,
            num_heads=self.num_heads, qkv_kernel=self.qkv_kernel,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            use_flash=self.use_flash, flash_train=self.flash_train,
            flash_frozen_bn=self.flash_frozen_bn, bn_track=self.bn_track,
            sequence_parallel=self.sequence_parallel, sp_mesh=self.sp_mesh,
            sp_min_tokens=self.sp_min_tokens,
            bn_axis_name=self.bn_axis_name, bn_eps=self.bn_eps,
            dtype=self.dtype, param_dtype=self.param_dtype)
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, reduction_axes=(-2, -1), feature_axes=(-2, -1),
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        if self.ln_mode == "shared":
            self.LN = ln("LN")
        else:
            self.LN1 = ln("LN1")
            self.LN2 = ln("LN2")
        self.FeedForward = FeedForward(
            projection_dim=self.projection_dim, hidden_dim=self.hidden_dim,
            dropout=self.linear_drop, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool = True):
        ln1 = self.LN if self.ln_mode == "shared" else self.LN1
        ln2 = self.LN if self.ln_mode == "shared" else self.LN2
        x = ln1(self.ReAttn(x, deterministic=deterministic,
                            use_running_average=use_running_average) + x)
        x = ln2(self.FeedForward(x, deterministic=deterministic) + x)
        return x


class FourierEncoderBlock(nn.Module):
    """FNet-style spectral mixer block (``FformerEncoder``,
    ``ViT_UNet.ipynb`` cell 24): the attention sublayer is replaced by
    ``x + Re(FFT2(x))`` over the (tokens, features) plane; ONE joint
    LayerNorm's weights are applied after both residuals, matching the
    reference's single shared ``self.LN``.

    Attention-free: O(N log N) token mixing on the VPU instead of the N²
    score matrix — the cheap alternative at the finest hierarchy level.
    """

    num_patches: int
    projection_dim: int
    hidden_dim: int
    linear_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool = True):
        del use_running_average  # stateless block; kept for API uniformity
        ln = nn.LayerNorm(
            epsilon=1e-5, reduction_axes=(-2, -1), feature_axes=(-2, -1),
            dtype=self.dtype, param_dtype=self.param_dtype, name="LN")
        ff = FeedForward(
            projection_dim=self.projection_dim, hidden_dim=self.hidden_dim,
            dropout=self.linear_drop, dtype=self.dtype,
            param_dtype=self.param_dtype, name="FeedForward")
        x = ln(x + jnp.fft.fft2(x).real.astype(x.dtype))
        x = ln(x + ff(x, deterministic=deterministic))
        return x


class TFTransformerEncoder(nn.Module):
    """TF-flavour encoder: ``num_layers`` post-norm blocks with last-axis LN.

    ``original_attn=True`` -> keras MHA blocks (tf/functions.py:303-311);
    ``False`` -> re-attention blocks with GELU'd 3x3 QKV convs
    (tf/functions.py:361-368).
    """

    num_patches: int
    projection_dim: int
    hidden_dim: int
    num_heads: int
    num_layers: int
    num_channels: int = 3
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    original_attn: bool = True
    use_flash: bool = False
    flash_train: bool = False
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 use_running_average: bool = True):
        for i in range(self.num_layers):
            if self.original_attn:
                attn_out = KerasMHA(
                    num_heads=self.num_heads, key_dim=self.projection_dim,
                    dropout=self.attn_drop, use_flash=self.use_flash,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"attn_{i}")(
                        x, x, deterministic=deterministic)
            else:
                attn_out = ReAttention(
                    dim=self.projection_dim, num_channels=self.num_channels,
                    num_heads=self.num_heads, qkv_kernel=3, qkv_gelu=True,
                    token_layout="cl", attn_drop=self.attn_drop,
                    use_flash=self.use_flash, flash_train=self.flash_train,
                    bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"reattn_{i}")(
                        x, deterministic=deterministic,
                        use_running_average=use_running_average)
            # epsilon=1e-3: tf.keras.layers.LayerNormalization's default, the
            # reference builds its LNs with no arguments (tf/functions.py:288)
            x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"ln1_{i}")(attn_out + x)
            ff = FeedForward(
                projection_dim=self.projection_dim, hidden_dim=self.hidden_dim,
                dropout=self.proj_drop, final_gelu=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"ff_{i}")(
                    x, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"ln2_{i}")(ff + x)
        return x
