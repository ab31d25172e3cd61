"""Patch-space shape algebra — the L1 "kernel library" of ViT-UNet, TPU-native.

The reference implements these as data-movement loops (``torch.unfold`` +
per-sample ``stack``/``cat`` in ``vit_unet/torch/model.py:8-53``; nested
``tf.map_fn`` in ``vit_unet/tf/functions.py:6-56``).  On TPU every one of these
operations is a pure layout change, so we express them as ``reshape`` +
``transpose`` (via einops), which XLA compiles to (mostly) zero-cost relayouts
that fuse into neighbouring ops.  No Python loops, no gathers, static shapes.

Two flavours exist in the reference and both are supported:

* **channel-major** (torch flavour): images are ``(B, C, H, W)``; a flattened
  patch vector is ordered ``(C, ph, pw)``.  Matches
  ``/root/reference/vit_unet/torch/model.py:8-35``.
* **channel-minor** (TF flavour): images are ``(B, H, W, C)``; a flattened
  patch vector is ordered ``(ph, pw, C)``.  Matches
  ``/root/reference/vit_unet/tf/functions.py:6-47``.

Patch index is row-major over the patch grid in both flavours
(``torch/model.py:16-17``: unfold rows then cols; ``tf/functions.py:12-14``).
"""
from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange

__all__ = [
    "patchify",
    "unpatchify",
    "flatten_patches",
    "unflatten",
    "split_patches",
    "merge_patches",
    "change_patch_size",
    "patchify_cl",
    "unpatchify_cl",
    "unflatten_cl",
    "change_patch_size_cl",
]


def _grid(n: int) -> int:
    g = round(n ** 0.5)
    if g * g != n:
        raise ValueError(f"num_patches={n} is not a perfect square")
    return g


# ---------------------------------------------------------------------------
# Channel-major (torch flavour): image (B, C, H, W), patch vector (C, ph, pw)
# ---------------------------------------------------------------------------

def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, C, p, p), row-major patch grid.

    Equivalent to ``patch`` at ``torch/model.py:8-18`` (the rank-5 squeeze at
    ``:11-12`` is unnecessary here: we never produce the rank-5 singleton).
    """
    if x.ndim == 5:  # (B, 1, C, H, W) compatibility with the reference's unpatch output
        x = jnp.squeeze(x, axis=1)
    h, w = x.shape[-2], x.shape[-1]
    if h % patch_size or w % patch_size:
        raise ValueError(f"patch_size={patch_size} must divide image {h}x{w}")
    return rearrange(
        x, "b c (gh p1) (gw p2) -> b (gh gw) c p1 p2", p1=patch_size, p2=patch_size
    )


def unpatchify(x: jnp.ndarray, num_channels: int | None = None) -> jnp.ndarray:
    """(B, N, C, p, p) or (B, N, C*p*p) -> (B, C, H, W).

    Replaces the per-sample Python ``stack``/``cat`` loops of ``unpatch``
    (``torch/model.py:26-35``) with a single relayout.  The reference returns
    rank-5 ``(B, 1, C, H, W)``; callers here get rank 4 (the singleton axis in
    the reference exists only to be squeezed again by ``patch``).
    """
    if x.ndim == 3:
        if num_channels is None:
            raise ValueError("num_channels required for flattened input")
        x = unflatten(x, num_channels)
    g = _grid(x.shape[1])
    return rearrange(x, "b (gh gw) c p1 p2 -> b c (gh p1) (gw p2)", gh=g, gw=g)


def flatten_patches(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C, p, p) -> (B, N, C*p*p)  (``torch.flatten(-3, -1)``)."""
    return rearrange(x, "b n c p1 p2 -> b n (c p1 p2)")


def unflatten(x: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """(B, N, C*p*p) -> (B, N, C, p, p)  (``unflatten``, torch/model.py:20-24)."""
    b, n, e = x.shape
    p = _grid(e // num_channels)
    return x.reshape(b, n, num_channels, p, p)


def split_patches(x: jnp.ndarray, num_channels: int, factor: int = 2) -> jnp.ndarray:
    """Halve the patch size (token count x factor²): the reference's ``downsampling``.

    ``torch/model.py:39-45`` does image round-trip unpatch->patch(p/2); under
    XLA this whole round trip is the single relayout below.
    (B, N, C*p*p) -> (B, N*factor², C*(p/factor)²).
    """
    return change_patch_size(x, num_channels, down_factor=factor)


def merge_patches(x: jnp.ndarray, num_channels: int, factor: int = 2) -> jnp.ndarray:
    """Double the patch size (token count / factor²): the reference's ``upsampling``
    (``torch/model.py:47-53``).  (B, N, E) -> (B, N/factor², E*factor²)."""
    return change_patch_size(x, num_channels, up_factor=factor)


def change_patch_size(
    x: jnp.ndarray,
    num_channels: int,
    *,
    down_factor: int = 1,
    up_factor: int = 1,
) -> jnp.ndarray:
    """Generic repatching of flat patch tokens (B, N, E) at a new patch size.

    ``down_factor=k`` splits each patch into k×k sub-patches (N*k², E/k²);
    ``up_factor=k`` merges k×k patch neighbourhoods (N/k², E*k²).  Exactly one
    may be > 1.  Generalises ``downsampling``/``upsampling``
    (``torch/model.py:39-53``) and the fine->coarse regroup inside the
    notebook ``PatchEncoder`` (``ViT_UNet.ipynb`` cell 16).
    """
    if down_factor > 1 and up_factor > 1:
        raise ValueError("choose either down_factor or up_factor, not both")
    b, n, e = x.shape
    g = _grid(n)
    p = _grid(e // num_channels)
    if down_factor > 1:
        k = down_factor
        if p % k:
            raise ValueError(f"patch size {p} not divisible by {k}")
        return rearrange(
            x.reshape(b, g, g, num_channels, p, p),
            "b r s c (i q1) (j q2) -> b (r i s j) (c q1 q2)",
            i=k, j=k,
        )
    if up_factor > 1:
        k = up_factor
        if g % k:
            raise ValueError(f"patch grid {g} not divisible by {k}")
        return rearrange(
            x.reshape(b, g // k, k, g // k, k, num_channels, p, p),
            "b r i s j c q1 q2 -> b (r s) (c i q1 j q2)",
        )
    return x


# ---------------------------------------------------------------------------
# Channel-minor (TF flavour): image (B, H, W, C), patch vector (ph, pw, C)
# ---------------------------------------------------------------------------

def patchify_cl(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, p, p, C).  Replaces the nested ``tf.map_fn`` of
    ``patches`` (``tf/functions.py:6-27``) with one relayout."""
    if x.ndim == 5:
        x = jnp.squeeze(x, axis=1)
    h, w = x.shape[1], x.shape[2]
    if h % patch_size or w % patch_size:
        raise ValueError(f"patch_size={patch_size} must divide image {h}x{w}")
    return rearrange(
        x, "b (gh p1) (gw p2) c -> b (gh gw) p1 p2 c", p1=patch_size, p2=patch_size
    )


def unflatten_cl(x: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """(B, N, p*p*C) -> (B, N, p, p, C)  (``unflatten``, tf/functions.py:29-35)."""
    b, n, e = x.shape
    p = _grid(e // num_channels)
    return x.reshape(b, n, p, p, num_channels)


def unpatchify_cl(x: jnp.ndarray, num_channels: int | None = None) -> jnp.ndarray:
    """(B, N, p, p, C) or (B, N, p*p*C) -> (B, H, W, C)
    (``unpatch``, tf/functions.py:37-47, without the singleton axis)."""
    if x.ndim == 3:
        if num_channels is None:
            raise ValueError("num_channels required for flattened input")
        x = unflatten_cl(x, num_channels)
    g = _grid(x.shape[1])
    return rearrange(x, "b (gh gw) p1 p2 c -> b (gh p1) (gw p2) c", gh=g, gw=g)


def change_patch_size_cl(
    x: jnp.ndarray,
    num_channels: int,
    *,
    down_factor: int = 1,
    up_factor: int = 1,
) -> jnp.ndarray:
    """TF-flavour generic repatching of (B, N, E) tokens; the zero-copy form of
    ``resampling`` (``tf/functions.py:49-56``)."""
    if down_factor > 1 and up_factor > 1:
        raise ValueError("choose either down_factor or up_factor, not both")
    b, n, e = x.shape
    g = _grid(n)
    p = _grid(e // num_channels)
    if down_factor > 1:
        k = down_factor
        return rearrange(
            x.reshape(b, g, g, p, p, num_channels),
            "b r s (i q1) (j q2) c -> b (r i s j) (q1 q2 c)",
            i=k, j=k,
        )
    if up_factor > 1:
        k = up_factor
        return rearrange(
            x.reshape(b, g // k, k, g // k, k, p, p, num_channels),
            "b r i s j q1 q2 c -> b (r s) (i q1 j q2 c)",
        )
    return x
