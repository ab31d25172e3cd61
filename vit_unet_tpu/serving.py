"""Serving: a jitted Predictor and ahead-of-time model export.

The reference's deployment story is ``model.save('model.h5')`` + reload
inside TF (``TPUs_in_Colab.ipynb`` cell 42).  The TPU-native equivalents:

* ``Predictor`` — eval-mode inference wrapper: params + jitted apply
  (optionally the fused flash-attention path), fixed-batch padding so every
  request hits one compiled program, micro-batching for large inputs.
* ``export_predictor`` / ``load_predictor`` — serialize the *compiled
  computation* (StableHLO via ``jax.export``) together with the params
  (orbax), so a serving process can run the model without the model code —
  the stronger analogue of a ``.h5`` full-model save.  The loaded function
  micro-batches/pads exactly like ``Predictor``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _eval_fn(model) -> Callable:
    """The one eval-mode apply used by both Predictor and export."""
    def fwd(variables, x):
        return model.apply(variables, x, deterministic=True,
                           use_running_average=True)
    return fwd


def _infer_input_shape(model) -> tuple:
    """Per-sample input shape from the model config: channels-first
    (C, H, W) for ViTUNet/ViTClassifier (``im_size``), channels-last
    (H, W, C) for the TF-orientation family (``img_size``)."""
    cfg = getattr(model, "config", None)
    if cfg is None:
        raise ValueError("input_shape required for config-less models")
    ch = getattr(cfg, "num_channels", 3)
    if hasattr(cfg, "im_size"):
        return (ch, cfg.im_size, cfg.im_size)          # NCHW family
    if hasattr(cfg, "img_size"):
        return (cfg.img_size, cfg.img_size, ch)        # NHWC (TF flavour)
    raise ValueError(f"cannot infer input shape from {type(cfg).__name__}; "
                     "pass input_shape explicitly")


def _micro_batched(fn: Callable, batch_size: int,
                   sample_ndim: int) -> Callable[[np.ndarray], np.ndarray]:
    """Wrap a fixed-batch fn into one accepting any leading batch (padding
    the last chunk) or a single unbatched sample."""
    def call(x) -> np.ndarray:
        x = np.asarray(x, np.float32)
        squeeze = x.ndim == sample_ndim
        if squeeze:
            x = x[None]
        n = x.shape[0]
        if n == 0:
            probe = np.zeros((batch_size, *x.shape[1:]), x.dtype)
            out = np.asarray(fn(jnp.asarray(probe)))
            return out[:0]
        outs = []
        for i in range(0, n, batch_size):
            chunk = x[i:i + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            out = np.asarray(fn(jnp.asarray(chunk)))
            outs.append(out[:batch_size - pad] if pad else out)
        result = np.concatenate(outs, axis=0)
        return result[0] if squeeze else result
    return call


class Predictor:
    """Eval-mode inference on a fixed compiled batch shape.

    >>> p = Predictor(model, variables, batch_size=8)
    >>> y = p(x)          # any leading batch; padded/micro-batched internally
    """

    def __init__(self, model, variables: dict, batch_size: int = 8,
                 input_shape: Optional[tuple] = None):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.input_shape = tuple(input_shape if input_shape is not None
                                 else _infer_input_shape(model))
        fwd = jax.jit(_eval_fn(model))
        self._call = _micro_batched(
            lambda x: fwd(self.variables, x), batch_size,
            sample_ndim=len(self.input_shape))

    def __call__(self, x) -> np.ndarray:
        return self._call(x)


def export_predictor(model, variables: dict, path: str,
                     batch_size: int = 8,
                     input_shape: Optional[tuple] = None,
                     platforms: tuple = ("cpu", "tpu")) -> str:
    """Serialize the compiled eval computation (StableHLO) + params.

    Layout: ``{path}/computation.jaxexport`` + ``{path}/params/`` (orbax).
    The exported artifact is loadable (``load_predictor``) in a process
    without vit_unet_tpu model code and runs on any JAX backend that
    supports the lowered ops.
    """
    import orbax.checkpoint as ocp
    from jax import export as jexport

    if input_shape is None:
        input_shape = _infer_input_shape(model)

    spec_vars = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables)
    x_spec = jax.ShapeDtypeStruct((batch_size, *input_shape), jnp.float32)
    # Multi-platform lowering: the artifact must run wherever it is loaded
    # (export-on-CPU -> serve-on-TPU and vice versa), not just on the
    # platform of the exporting process.
    exported = jexport.export(jax.jit(_eval_fn(model)),
                              platforms=list(platforms))(spec_vars, x_spec)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "computation.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "params")), variables,
               force=True)
    ckptr.wait_until_finished()
    return path


def load_predictor(path: str,
                   device=None) -> Callable[[np.ndarray], np.ndarray]:
    """Load an exported predictor: returns f(x) with the same any-batch
    padding/micro-batching contract as ``Predictor``.

    ``device`` pins where params live and the computation runs; when None
    the pinned ``jax_default_device`` wins, then the default backend —
    probed with a tiny dispatch so a registered-but-broken TPU plugin
    (e.g. libtpu client/terminal mismatch) degrades to CPU instead of
    failing at the first predict call."""
    import orbax.checkpoint as ocp
    from jax import export as jexport

    with open(os.path.join(path, "computation.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    ckptr = ocp.StandardCheckpointer()
    # Restore against an abstract target rebuilt from the exported input
    # spec.  A template-free restore would replay the *saving* process's
    # device layout (e.g. "Device TFRT_CPU_0 was not found" when an
    # artifact exported on CPU is loaded in a TPU process); the abstract
    # target places params on this process's default devices instead.
    in_args, _ = jax.tree.unflatten(exported.in_tree, exported.in_avals)
    # honour (1) an explicit device argument, (2) a pinned jax_default_device
    # — jax.devices()[0] would be the TPU plugin even when execution is
    # pinned to CPU — then (3) the default backend, dispatch-probed so a
    # broken plugin degrades to CPU
    if device is None:
        device = jax.config.jax_default_device
    if device is None:
        try:
            device = jax.devices()[0]
            jax.block_until_ready(
                jax.device_put(jnp.zeros((), jnp.float32), device))
        except Exception:
            device = jax.devices("cpu")[0]
    sharding = jax.sharding.SingleDeviceSharding(device)
    spec_vars = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding),
        in_args[0])
    variables = ckptr.restore(
        os.path.abspath(os.path.join(path, "params")), spec_vars)
    # input spec: (vars..., x) — x is the last input
    x_aval = exported.in_avals[-1]
    batch_size = x_aval.shape[0]
    sample_ndim = len(x_aval.shape) - 1

    return _micro_batched(lambda x: exported.call(variables, x),
                          batch_size, sample_ndim)
