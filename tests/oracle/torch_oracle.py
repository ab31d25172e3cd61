"""PyTorch parity oracle for ViT-UNet (CPU, vectorised, from-scratch).

The packaged reference model cannot instantiate (SURVEY.md §2.5.1), so this
oracle implements the *canonical* semantics — the notebook ``ViT_UNet``
(``ViT_UNet.ipynb`` cell 44) with the packaged model's 3x3 QKV convs — which
is the unique combination that reproduces all four published parameter counts:

* lite 3,387,568 / base 36,613,036 / large 63,043,866 (``README.md:16,34,52``)
  with ``qkv_kernel=3`` and a single shared LayerNorm per block,
* the 512² notebook config 50,345,433 (``ViT_UNet.ipynb`` cell 46) with
  ``qkv_kernel=1``.

Written vectorised (no per-sample Python loops) but numerically identical to
the reference semantics; parameter names deliberately mirror the reference
module tree (``PE.position_embedding``, ``Encoders.N.ReAttn.qconv2d`` ...) so
``state_dict`` keys line up with real reference checkpoints.
"""
from __future__ import annotations

import math

import torch
from torch import nn


# --- patch algebra (semantics of torch/model.py:8-53, vectorised) ---

def patch(x: torch.Tensor, p: int) -> torch.Tensor:
    if x.dim() == 5:
        x = x.squeeze(1)
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // p, p, w // p, p)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), c, p, p)


def unflatten(x: torch.Tensor, c: int) -> torch.Tensor:
    b, n, e = x.shape
    p = int(math.isqrt(e // c))
    return x.reshape(b, n, c, p, p)


def unpatch(x: torch.Tensor, c: int) -> torch.Tensor:
    if x.dim() == 3:
        x = unflatten(x, c)
    b, n, ch, p, q = x.shape
    g = int(math.isqrt(n))
    x = x.reshape(b, g, g, ch, p, q).permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, ch, g * p, g * q)


def flatten_patches(x: torch.Tensor) -> torch.Tensor:
    return x.flatten(-3, -1)


def downsampling(x: torch.Tensor, c: int) -> torch.Tensor:
    e = x.shape[-1]
    p = int(math.isqrt(e // c))
    return flatten_patches(patch(unpatch(x, c), p // 2))


def upsampling(x: torch.Tensor, c: int) -> torch.Tensor:
    e = x.shape[-1]
    p = int(math.isqrt(e // c))
    return flatten_patches(patch(unpatch(x, c), p * 2))


# --- layers ---

class PatchEncoder(nn.Module):
    """Notebook PatchEncoder (ViT_UNet.ipynb cell 16): preprocess, patchify at
    the finest level, positional-embed, regroup to the coarse level."""

    def __init__(self, depth, num_patches, patch_size, num_channels, preprocessing):
        super().__init__()
        self.depth = depth
        self.patch_size = patch_size
        self.patch_size_final = patch_size // 2 ** depth
        self.num_patches_final = num_patches * 4 ** depth
        self.num_channels = num_channels
        self.preprocessing = preprocessing
        if preprocessing == "conv":
            self.conv2d = nn.Conv2d(num_channels, num_channels, 3, padding="same")
        self.position_embedding = nn.Embedding(
            self.num_patches_final, num_channels * self.patch_size_final ** 2
        )

    def forward(self, x):
        if self.preprocessing == "conv":
            x = self.conv2d(x)
        elif self.preprocessing == "fourier":
            x = torch.fft.fft2(x).real
        flat = flatten_patches(patch(x, self.patch_size_final))
        encoded = flat + self.position_embedding.weight
        return flatten_patches(patch(unpatch(encoded, self.num_channels), self.patch_size))


class FeedForward(nn.Module):
    def __init__(self, projection_dim, hidden_dim, dropout):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(projection_dim, hidden_dim),
            nn.GELU(),
            nn.Dropout(dropout),
            nn.Linear(hidden_dim, projection_dim),
            nn.Dropout(dropout),
        )

    def forward(self, x):
        return self.net(x)


class ReAttention(nn.Module):
    """DeepViT re-attention with conv-QKV in patch space (torch/model.py:113-164),
    vectorised over (B*N) patches instead of a per-sample Python loop."""

    def __init__(self, dim, num_channels=3, num_heads=8, qkv_kernel=3,
                 qkv_bias=False, qk_scale=None, attn_drop=0.0, proj_drop=0.0,
                 apply_transform=True, transform_scale=False):
        super().__init__()
        self.num_heads = num_heads
        self.num_channels = num_channels
        self.apply_transform = apply_transform
        self.scale = qk_scale or (dim // num_heads) ** -0.5
        c = num_channels
        self.qconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        self.kconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        self.vconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        if apply_transform:
            self.reatten_matrix = nn.Conv2d(num_heads, num_heads, 1, 1)
            self.var_norm = nn.BatchNorm2d(num_heads)
            self.reatten_scale = self.scale if transform_scale else 1.0
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def _conv_heads(self, x, conv):
        b, n, e = x.shape
        pats = unflatten(x, self.num_channels)          # (B, N, C, p, p)
        out = conv(pats.reshape(b * n, *pats.shape[2:])).reshape(pats.shape)
        flat = flatten_patches(out)                     # (B, N, E)
        dh = e // self.num_heads
        return flat.reshape(b, n, self.num_heads, dh).permute(0, 2, 1, 3)

    def forward(self, x):
        b, n, e = x.shape
        q = self._conv_heads(x, self.qconv2d)
        k = self._conv_heads(x, self.kconv2d)
        v = self._conv_heads(x, self.vconv2d)
        attn = torch.matmul(q, k.transpose(-2, -1)) * self.scale
        attn = torch.softmax(attn, dim=-1)
        attn = self.attn_drop(attn)
        if self.apply_transform:
            attn = self.var_norm(self.reatten_matrix(attn)) * self.reatten_scale
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, n, e)
        return self.proj_drop(self.proj(out))


class ReAttentionTransformerEncoder(nn.Module):
    """Post-norm block with joint LayerNorm over (tokens, features).

    ``ln_mode='shared'``: one LN applied after both residuals (notebook cell 27
    — the configuration matching the README parameter counts).
    ``ln_mode='dual'``: separate LN1/LN2 (packaged torch/model.py:193-196).
    """

    def __init__(self, num_patches, num_channels, projection_dim, hidden_dim,
                 num_heads, attn_drop, proj_drop, linear_drop,
                 qkv_kernel=3, ln_mode="shared"):
        super().__init__()
        self.ln_mode = ln_mode
        self.ReAttn = ReAttention(projection_dim, num_channels, num_heads,
                                  qkv_kernel, attn_drop=attn_drop,
                                  proj_drop=proj_drop)
        shape = (num_patches, projection_dim)
        if ln_mode == "shared":
            self.LN = nn.LayerNorm(shape)
        else:
            self.LN1 = nn.LayerNorm(shape)
            self.LN2 = nn.LayerNorm(shape)
        self.FeedForward = FeedForward(projection_dim, hidden_dim, linear_drop)

    def forward(self, x):
        ln1 = self.LN if self.ln_mode == "shared" else self.LN1
        ln2 = self.LN if self.ln_mode == "shared" else self.LN2
        x = ln1(self.ReAttn(x) + x)
        x = ln2(self.FeedForward(x) + x)
        return x


class SkipConnection(nn.Module):
    """Cross-attention skip fusion (torch/model.py:211-259): q = encoder skip,
    k = v = decoder stream; re-attention transform always on."""

    def __init__(self, dim, num_channels=3, num_heads=8, qkv_kernel=3,
                 qkv_bias=False, attn_drop=0.0, proj_drop=0.0,
                 transform_scale=False):
        super().__init__()
        self.num_heads = num_heads
        self.num_channels = num_channels
        self.scale = (dim // num_heads) ** -0.5
        c = num_channels
        self.qconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        self.kconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        self.vconv2d = nn.Conv2d(c, c, qkv_kernel, padding="same", bias=qkv_bias)
        self.reatten_matrix = nn.Conv2d(num_heads, num_heads, 1, 1)
        self.var_norm = nn.BatchNorm2d(num_heads)
        self.reatten_scale = self.scale if transform_scale else 1.0
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def _conv_heads(self, x, conv):
        b, n, e = x.shape
        pats = unflatten(x, self.num_channels)
        out = conv(pats.reshape(b * n, *pats.shape[2:])).reshape(pats.shape)
        dh = e // self.num_heads
        return flatten_patches(out).reshape(b, n, self.num_heads, dh).permute(0, 2, 1, 3)

    def forward(self, q, k, v):
        b, n, e = q.shape
        qh = self._conv_heads(q, self.qconv2d)
        kh = self._conv_heads(k, self.kconv2d)
        vh = self._conv_heads(v, self.vconv2d)
        attn = torch.matmul(qh, kh.transpose(-2, -1)) * self.scale
        attn = torch.softmax(attn, dim=-1)
        attn = self.attn_drop(attn)
        attn = self.var_norm(self.reatten_matrix(attn)) * self.reatten_scale
        out = torch.matmul(attn, vh).transpose(1, 2).reshape(b, n, e)
        return self.proj_drop(self.proj(out))


class ViTUNetOracle(nn.Module):
    """Canonical ViT-UNet: notebook cell 44 assembly with configurable
    qkv_kernel / ln_mode (see module docstring for which configs use which)."""

    def __init__(self, depth, depth_te, size_bottleneck, preprocessing,
                 im_size, patch_size, num_channels, hidden_dim, num_heads,
                 attn_drop, proj_drop, linear_drop,
                 qkv_kernel=3, ln_mode="shared"):
        super().__init__()
        assert patch_size % 2 ** depth == 0
        assert patch_size // 2 ** depth >= 4
        assert im_size % patch_size == 0
        self.depth = depth
        self.depth_te = depth_te
        self.preprocessing = preprocessing
        self.im_size = im_size
        self.num_channels = num_channels
        self.num_patches = (im_size // patch_size) ** 2
        self.projection_dim = num_channels * patch_size ** 2

        self.PE = PatchEncoder(depth, self.num_patches, patch_size,
                               num_channels, preprocessing)

        def block(level_factor, hidden_factor):
            return ReAttentionTransformerEncoder(
                self.num_patches * level_factor, num_channels,
                self.projection_dim // level_factor, hidden_dim // hidden_factor,
                num_heads, attn_drop, proj_drop, linear_drop,
                qkv_kernel, ln_mode)

        self.Encoders = nn.ModuleList(
            block(4 ** lvl, 2 ** lvl)
            for lvl in range(depth) for _ in range(depth_te))
        self.BottleNeck = nn.ModuleList(
            block(4 ** depth, 2 ** depth) for _ in range(size_bottleneck))
        self.Decoders = nn.ModuleList(
            block(4 ** (depth - lvl), 2 ** (depth - lvl))
            for lvl in range(depth) for _ in range(depth_te))
        self.SkipConnections = nn.ModuleList(
            SkipConnection(self.projection_dim // 4 ** (depth - lvl - 1),
                           num_channels, num_heads, qkv_kernel,
                           attn_drop=attn_drop, proj_drop=proj_drop)
            for lvl in range(depth))
        if preprocessing == "conv":
            self.conv2d = nn.Conv2d(num_channels, num_channels, 3, padding="same")

    def forward(self, x):
        b = x.shape[0]
        h = self.PE(x)
        skips = []
        for i, enc in enumerate(self.Encoders):
            h = enc(h)
            if (i + 1) % self.depth_te == 0:
                skips.append(h)
                h = downsampling(h, self.num_channels)
        for bott in self.BottleNeck:
            h = bott(h)
        for i, dec in enumerate(self.Decoders):
            h = dec(h)
            if (i + 1) % self.depth_te == 0:
                lvl = (i + 1) // self.depth_te
                h = upsampling(h, self.num_channels)
                h = self.SkipConnections[lvl - 1](skips[self.depth - lvl], h, h)
        out = unpatch(h, self.num_channels).reshape(
            b, self.num_channels, self.im_size, self.im_size)
        if self.preprocessing == "conv":
            out = self.conv2d(out)
        elif self.preprocessing == "fourier":
            out = torch.fft.ifft2(x, norm="ortho").real
        return out


PRESETS = {
    # README.md:16-68 / torch/model.py:438-486
    "lite": dict(depth=2, depth_te=1, size_bottleneck=2, preprocessing="conv",
                 im_size=224, patch_size=16, num_channels=3, hidden_dim=64,
                 num_heads=4, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
    "base": dict(depth=2, depth_te=2, size_bottleneck=2, preprocessing="conv",
                 im_size=224, patch_size=32, num_channels=3, hidden_dim=128,
                 num_heads=8, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
    "large": dict(depth=2, depth_te=4, size_bottleneck=4, preprocessing="conv",
                  im_size=224, patch_size=32, num_channels=3, hidden_dim=128,
                  num_heads=8, attn_drop=0.2, proj_drop=0.2, linear_drop=0.0),
}


def get_oracle(name: str) -> ViTUNetOracle:
    return ViTUNetOracle(**PRESETS[name])
