"""Global seeding — ``seed_everything`` (ViT_UNet_TF_TPU.ipynb cell 7).

The reference seeds python/numpy/TF once per run; here the JAX analogue also
returns a root ``jax.random`` key, since JAX RNG is explicit-state.
"""
from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    """Seed python, numpy, and (if present) torch/TF; returns a jax key."""
    random.seed(seed)
    np.random.seed(seed)
    # NOTE: only affects CHILD processes (loader workers etc.) — hash
    # randomization of the running interpreter is fixed at startup.
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:  # optional backends, seeded for oracle/test reproducibility
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
    try:
        import tensorflow as tf
        tf.random.set_seed(seed)
    except ImportError:
        pass
    return jax.random.key(seed)
