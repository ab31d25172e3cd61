"""Stat-matched BN refold: a function-preserving frozen→exact-BN flip.

The reference architecture's head-mix BatchNorm (torch
``vit_unet/torch/model.py:136,159``) normalises attention-map distributions
that are near-degenerate at init (var ~1e-6), so training with exact
batch-stats semantics from scratch puts a ~1/sqrt(var+eps) ≈ 300× amplifier
on noise-level attention variations and the optimiser never leaves the init
plateau (CONVERGENCE.json ``segmentation_demo`` exact-bn).  Frozen-BN
(normalise with the init running stats) trains fine — but a hard flip to
batch-stats semantics afterwards is a normalisation *shock*: the running
statistics never moved off init during the frozen phase, so the flip
multiplies the BN branch by that same ~300× factor and destroys the warmed
solution (``bn-hard-flip`` run).

The refold makes the flip *exactly function-preserving* instead.  For each
head-mix BN with frozen stats (μ_r, σ_r²) and affine (γ, β), measure the
batch moments (μ_b, σ_b²) of its input under the current parameters, then
set

    γ' = γ · √(σ_b²+ε) / √(σ_r²+ε)
    β' = β + γ · (μ_b − μ_r) / √(σ_r²+ε)

so that  γ'·(a−μ_b)/√(σ_b²+ε) + β'  ≡  γ·(a−μ_r)/√(σ_r²+ε) + β  for every
input ``a``: the exact-BN forward at the flip computes the same function the
frozen forward did (up to the per-batch fluctuation of the batch moments
around their measured values — negligible here, each moment averages
B·N² ≳ 10⁶ samples).  The running statistics are simultaneously set to the
measured moments so eval (running-average semantics) is unchanged too.

Moment estimation runs the *XLA* attention path (flash kernels disabled)
with ``capture_intermediates`` on every ``reatten_matrix`` output — the
exact tensor ``var_norm`` normalises (``nn/reattention.py``), numerically
parity-tested against the flash kernels — with dropout off and frozen-BN
forward semantics, in float32.  This sidesteps the bf16 running-average
storage: recovering var ~1e-6 through a 0.9-momentum EMA held in bf16 loses
the signal to cancellation entirely.

Used by ``Fitter(bn_freeze_epochs=K, bn_warmup='refold')`` and demonstrated
end-to-end in ``examples/convergence_segmentation.py`` (the shipped
mitigation for the exact-BN trainability pathology).
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

__all__ = ["estimate_bn_moments", "bn_refold"]


def _xla_clone(model):
    """A clone of ``model`` that runs the pure-XLA attention path (flash
    kernels off) so intermediates can be captured; other semantics equal."""
    cfg = getattr(model, "config", None)
    if cfg is not None and hasattr(cfg, "use_flash"):
        kw = {"use_flash": False}
        if hasattr(cfg, "flash_train"):
            kw["flash_train"] = False
        return model.clone(config=dataclasses.replace(cfg, **kw))
    return model


def estimate_bn_moments(model, variables, batches: Iterable,
                        max_batches: Optional[int] = None):
    """Measure each head-mix BatchNorm's input batch moments under the
    current parameters.

    ``model``: the training model (flash flags are disabled internally).
    ``variables``: {'params': ..., 'batch_stats': ...}.
    ``batches``: iterable of input arrays or {'x': ...} dicts; moments are
    averaged over the batches (they are extremely stable — each one pools
    B·N² samples per head).

    Returns ``{module_path_tuple: (mean, var)}`` with float32 per-head
    arrays, keyed by the ReAttention module's path (the parent of both
    ``reatten_matrix`` and ``var_norm``).  Forward semantics: frozen BN
    (running averages), dropout off — the function the frozen warmup phase
    trained.
    """
    est_model = _xla_clone(model)

    @jax.jit
    def capture(x):
        _, inter = est_model.apply(
            variables, x, deterministic=True, use_running_average=True,
            capture_intermediates=lambda mdl, _: mdl.name == "reatten_matrix",
            mutable=["intermediates"])
        flat = traverse_util.flatten_dict(inter["intermediates"])
        out = {}
        for path, val in flat.items():
            a = (val[0] if isinstance(val, tuple) else val).astype(
                jnp.float32)
            axes = tuple(range(a.ndim - 1))     # stats per head (last axis)
            out[path[:-2]] = (jnp.mean(a, axes), jnp.var(a, axes))
        return out

    sums: dict = {}
    n = 0
    for i, b in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        x = b["x"] if isinstance(b, dict) else b
        res = jax.device_get(capture(jnp.asarray(x)))
        for path, (mu, var) in res.items():
            smu, svar = sums.get(path, (0.0, 0.0))
            sums[path] = (smu + np.asarray(mu, np.float64),
                          svar + np.asarray(var, np.float64))
        n += 1
    if n == 0:
        raise ValueError("estimate_bn_moments received no batches")
    return {path: (np.float32(smu / n), np.float32(svar / n))
            for path, (smu, svar) in sums.items()}


def bn_refold(params, batch_stats, moments, eps: float):
    """Fold the measured batch moments into every head-mix BN's affine and
    running statistics (formulas above).  Returns ``(params, batch_stats)``
    with only the ``var_norm`` leaves changed, dtypes preserved.

    After this, training with batch-stats BN semantics (and eval with
    running averages) computes the same function the frozen forward did at
    the flip — a continuous start for the exact-semantics phase.
    """
    pflat = traverse_util.flatten_dict(params)
    bflat = traverse_util.flatten_dict(batch_stats)
    done = 0
    for path, (mu_b, var_b) in moments.items():
        skey, bkey = path + ("var_norm", "scale"), path + ("var_norm", "bias")
        mkey, vkey = path + ("var_norm", "mean"), path + ("var_norm", "var")
        if mkey not in bflat:
            continue   # e.g. KerasMHA identity head-mix: no BN to refold
        g = np.asarray(pflat[skey], np.float64)
        b = np.asarray(pflat[bkey], np.float64)
        mu_r = np.asarray(bflat[mkey], np.float64)
        var_r = np.asarray(bflat[vkey], np.float64)
        s_r = np.sqrt(var_r + eps)
        s_b = np.sqrt(np.asarray(var_b, np.float64) + eps)
        pflat[skey] = jnp.asarray(g * s_b / s_r).astype(pflat[skey].dtype)
        pflat[bkey] = jnp.asarray(b + g * (mu_b - mu_r) / s_r).astype(
            pflat[bkey].dtype)
        bflat[mkey] = jnp.asarray(mu_b).astype(bflat[mkey].dtype)
        bflat[vkey] = jnp.asarray(var_b).astype(bflat[vkey].dtype)
        done += 1
    if done == 0:
        raise ValueError(
            "bn_refold matched no var_norm modules — the model has no "
            "head-mix BatchNorm (nothing to warm up; drop bn_warmup)")
    return (traverse_util.unflatten_dict(pflat),
            traverse_util.unflatten_dict(bflat))
