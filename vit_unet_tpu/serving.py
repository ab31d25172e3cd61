"""Serving: a jitted Predictor and ahead-of-time model export.

The reference's deployment story is ``model.save('model.h5')`` + reload
inside TF (``TPUs_in_Colab.ipynb`` cell 42).  The TPU-native equivalents:

* ``Predictor`` — eval-mode inference wrapper: params + jitted apply
  (optionally the fused flash-attention path), fixed-batch padding so every
  request hits one compiled program, micro-batching for large inputs.
* ``export_predictor`` / ``load_predictor`` — serialize the *compiled
  computation* (StableHLO via ``jax.export``) together with the params
  (orbax), so a serving process can run the model without the model code —
  the stronger analogue of a ``.h5`` full-model save.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


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
        cfg = getattr(model, "config", None)
        if input_shape is None:
            if cfg is None:
                raise ValueError("input_shape required for config-less models")
            input_shape = (getattr(cfg, "num_channels", 3),
                           cfg.im_size, cfg.im_size)
        self.input_shape = tuple(input_shape)

        def fwd(variables, x):
            return model.apply(variables, x, deterministic=True,
                               use_running_average=True)

        self._fn = jax.jit(fwd)

    def __call__(self, x) -> np.ndarray:
        x = np.asarray(x, np.float32)
        squeeze = x.ndim == len(self.input_shape)
        if squeeze:
            x = x[None]
        n = x.shape[0]
        outs = []
        bs = self.batch_size
        for i in range(0, n, bs):
            chunk = x[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            out = np.asarray(self._fn(self.variables, jnp.asarray(chunk)))
            outs.append(out[:bs - pad] if pad else out)
        result = np.concatenate(outs, axis=0)
        return result[0] if squeeze else result


def export_predictor(model, variables: dict, path: str,
                     batch_size: int = 8,
                     input_shape: Optional[tuple] = None) -> str:
    """Serialize the compiled eval computation (StableHLO) + params.

    Layout: ``{path}/computation.jaxexport`` + ``{path}/params/`` (orbax).
    The exported artifact is loadable (``load_predictor``) in a process
    without vit_unet_tpu model code and runs on any JAX backend that
    supports the lowered ops.
    """
    import orbax.checkpoint as ocp
    from jax import export as jexport

    cfg = getattr(model, "config", None)
    if input_shape is None:
        input_shape = (getattr(cfg, "num_channels", 3),
                       cfg.im_size, cfg.im_size)

    def fwd(variables, x):
        return model.apply(variables, x, deterministic=True,
                           use_running_average=True)

    spec_vars = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        variables)
    x_spec = jax.ShapeDtypeStruct((batch_size, *input_shape), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(spec_vars, x_spec)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "computation.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "params")), variables,
               force=True)
    ckptr.wait_until_finished()
    return path


def load_predictor(path: str):
    """Load an exported predictor: returns f(x: (B, C, H, W)) -> output."""
    import orbax.checkpoint as ocp
    from jax import export as jexport

    with open(os.path.join(path, "computation.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.abspath(os.path.join(path, "params")))

    def fn(x):
        return exported.call(variables, jnp.asarray(x, jnp.float32))

    return fn
