"""Import PyTorch ViT-UNet weights into the JAX model.

Translates a torch ``state_dict`` (e.g. the reference's benatools
``best-checkpoint.bin``, ``run_denoising.py:88,100``, or the parity oracle in
``tests/oracle/torch_oracle.py`` whose keys mirror the reference module tree)
into flax ``{'params': ..., 'batch_stats': ...}`` variables for
``vit_unet_tpu.models.ViTUNet``.

Torch->flax layout conventions:
* Linear ``weight`` (out, in)            -> Dense ``kernel`` (in, out)
* Conv2d ``weight`` (O, I, kh, kw)       -> Conv ``kernel`` (kh, kw, I, O)
* Embedding ``weight``                   -> Embed ``embedding``
* LayerNorm/BatchNorm ``weight``/``bias``-> ``scale``/``bias``
* BatchNorm ``running_mean``/``var``     -> batch_stats ``mean``/``var``
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _module_path(torch_path: str) -> list[str]:
    """'Encoders.0.ReAttn' -> ['Encoders_0', 'ReAttn'] etc."""
    parts = torch_path.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{parts[i]}_{parts[i + 1]}")
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


_RENAMES = {
    # FeedForward nn.Sequential indices (oracle/reference) -> named layers
    ("net_0",): "fc1",
    ("net_3",): "fc2",
}


def _rename(path: list[str]) -> list[str]:
    out = []
    for p in path:
        out.append(_RENAMES.get((p,), p))
    return out


def import_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
) -> dict:
    """Build flax variables from a torch state_dict of the canonical model."""
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        arr = np.asarray(getattr(value, "detach", lambda: value)())
        if key.endswith("num_batches_tracked"):
            continue
        mod_path, leaf = key.rsplit(".", 1)
        path = _rename(_module_path(mod_path))
        # SkipConnection submodules live under an inner 'attn' module in flax
        if path and path[0].startswith("SkipConnections_"):
            path = [path[0], "attn", *path[1:]]
        is_conv = path[-1].endswith("conv2d") or path[-1] in (
            "reatten_matrix", "conv2d", "conv")
        is_norm = path[-1] in ("var_norm", "LN", "LN1", "LN2") or path[-1].startswith("ln")
        is_embed = path[-1] == "position_embedding"
        if leaf == "weight":
            if is_conv:
                _set(params, path + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif is_embed:
                _set(params, path + ["embedding"], arr)
            elif is_norm:
                _set(params, path + ["scale"], arr)
            else:  # Linear
                _set(params, path + ["kernel"], arr.T)
        elif leaf == "bias":
            _set(params, path + ["bias"], arr)
        elif leaf == "running_mean":
            _set(batch_stats, path + ["mean"], arr)
        elif leaf == "running_var":
            _set(batch_stats, path + ["var"], arr)
        else:
            raise ValueError(f"unrecognised torch parameter {key!r}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def import_torch_checkpoint(path: str) -> dict:
    """Load a torch checkpoint file (benatools fitter layout or raw state_dict)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return import_torch_state_dict(blob)
