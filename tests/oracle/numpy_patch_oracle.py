"""Loop-based NumPy transcription of the reference's patch algebra.

Deliberately written with explicit Python loops mirroring the *semantics* of
``/root/reference/vit_unet/torch/model.py:8-53`` (unfold/stack/cat) and
``/root/reference/vit_unet/tf/functions.py:6-56`` (split/map_fn), so the
vectorised JAX ops in ``vit_unet_tpu.ops.patches`` can be property-tested
against an independent implementation.
"""
import numpy as np


# --- channel-major (torch flavour) ---

def patch_oracle(x: np.ndarray, p: int) -> np.ndarray:
    """(B, C, H, W) -> (B, N, C, p, p), row-major grid (torch/model.py:8-18)."""
    b, c, h, w = x.shape
    out = []
    for row in range(h // p):
        for col in range(w // p):
            out.append(x[:, :, row * p:(row + 1) * p, col * p:(col + 1) * p])
    return np.stack(out, axis=1)


def unpatch_oracle(x: np.ndarray) -> np.ndarray:
    """(B, N, C, p, p) -> (B, C, H, W) (torch/model.py:26-35, squeezed)."""
    b, n, c, h, w = x.shape
    g = int(round(np.sqrt(n)))
    grid = x.reshape(b, g, g, c, h, w)
    rows = [np.concatenate([grid[:, r, s] for s in range(g)], axis=-1) for r in range(g)]
    return np.concatenate(rows, axis=-2)


def flatten_oracle(x: np.ndarray) -> np.ndarray:
    return x.reshape(x.shape[0], x.shape[1], -1)


def unflatten_oracle(x: np.ndarray, c: int) -> np.ndarray:
    b, n, e = x.shape
    p = int(round(np.sqrt(e // c)))
    return x.reshape(b, n, c, p, p)


def downsampling_oracle(x: np.ndarray, c: int) -> np.ndarray:
    """torch/model.py:39-45: image round trip, re-patch at p//2."""
    e = x.shape[-1]
    p = int(round(np.sqrt(e / c)))
    img = unpatch_oracle(unflatten_oracle(x, c))
    return flatten_oracle(patch_oracle(img, p // 2))


def upsampling_oracle(x: np.ndarray, c: int) -> np.ndarray:
    """torch/model.py:47-53: image round trip, re-patch at p*2."""
    e = x.shape[-1]
    p = int(round(np.sqrt(e / c)))
    img = unpatch_oracle(unflatten_oracle(x, c))
    return flatten_oracle(patch_oracle(img, p * 2))


# --- channel-minor (TF flavour) ---

def patches_cl_oracle(x: np.ndarray, p: int) -> np.ndarray:
    """(B, H, W, C) -> (B, N, p, p, C) (tf/functions.py:6-27)."""
    b, h, w, c = x.shape
    out = []
    for row in range(h // p):
        for col in range(w // p):
            out.append(x[:, row * p:(row + 1) * p, col * p:(col + 1) * p, :])
    return np.stack(out, axis=1)


def unpatch_cl_oracle(x: np.ndarray) -> np.ndarray:
    """(B, N, p, p, C) -> (B, H, W, C) (tf/functions.py:37-47, squeezed)."""
    b, n, h, w, c = x.shape
    g = int(round(np.sqrt(n)))
    grid = x.reshape(b, g, g, h, w, c)
    rows = [np.concatenate([grid[:, r, s] for s in range(g)], axis=-2) for r in range(g)]
    return np.concatenate(rows, axis=-3)
