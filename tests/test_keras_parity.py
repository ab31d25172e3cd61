"""Golden parity vs the actual tf.keras implementations for the TF-flavour
components — the strongest evidence that the TF-orientation path reproduces
the reference semantics (``tf/functions.py`` uses keras MHA/Dense/LN
directly).  TensorFlow is in the image; tests skip cleanly without it.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

TOL = 1e-4


def test_keras_mha_parity():
    """KerasMHA == tf.keras.layers.MultiHeadAttention with the same weights
    (self-attention, the reference's original_attn block —
    tf/functions.py:290-295)."""
    from vit_unet_tpu.nn.mha import KerasMHA

    b, n, feat = 2, 10, 24
    heads, key_dim = 4, 24   # reference passes key_dim=projection_dim
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, n, feat)).astype(np.float32)

    tmha = tf.keras.layers.MultiHeadAttention(num_heads=heads,
                                              key_dim=key_dim)
    t_out = tmha(x, x).numpy()                   # builds weights

    jmha = KerasMHA(num_heads=heads, key_dim=key_dim)
    variables = jmha.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x))

    # transplant keras weights -> flax params (same (in, heads, dim) layout);
    # keras MHA weight order: query(k,b), key(k,b), value(k,b), out(k,b)
    params = dict(variables["params"])
    w = [np.asarray(t) for t in tmha.weights]
    for i, ours in enumerate(["query", "key", "value", "out"]):
        params[ours] = {"kernel": jnp.asarray(w[2 * i]),
                        "bias": jnp.asarray(w[2 * i + 1])}

    j_out = np.asarray(jmha.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=TOL, atol=TOL)


def test_keras_mha_cross_attention_parity():
    """Skip-connection usage: MHA(query=skip, value=decoder)
    (tf/functions.py:394-395)."""
    from vit_unet_tpu.nn.mha import KerasMHA

    b, n, feat = 2, 8, 16
    heads, key_dim = 2, 16
    rng = np.random.default_rng(1)
    q = rng.normal(size=(b, n, feat)).astype(np.float32)
    v = rng.normal(size=(b, n, feat)).astype(np.float32)

    tmha = tf.keras.layers.MultiHeadAttention(num_heads=heads,
                                              key_dim=key_dim)
    t_out = tmha(q, v).numpy()

    jmha = KerasMHA(num_heads=heads, key_dim=key_dim)
    variables = jmha.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(v))
    params = dict(variables["params"])
    w = [np.asarray(t) for t in tmha.weights]
    for i, ours in enumerate(["query", "key", "value", "out"]):
        params[ours] = {"kernel": jnp.asarray(w[2 * i]),
                        "bias": jnp.asarray(w[2 * i + 1])}

    j_out = np.asarray(jmha.apply({"params": params}, jnp.asarray(q),
                                  jnp.asarray(v)))
    np.testing.assert_allclose(j_out, t_out, rtol=TOL, atol=TOL)


def test_feedforward_tf_flavour_parity():
    """TF FeedForward: D1->GELU->Drop->D2->GELU->Drop (extra final GELU,
    tf/functions.py:171-181) vs a keras Sequential with the same weights."""
    from vit_unet_tpu.nn.feedforward import FeedForward

    proj, hidden = 12, 20
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 6, proj)).astype(np.float32)

    ff = FeedForward(projection_dim=proj, hidden_dim=hidden, dropout=0.0,
                     final_gelu=True)
    variables = ff.init(jax.random.key(0), jnp.asarray(x))

    km = tf.keras.Sequential([
        tf.keras.layers.Dense(hidden, activation=tf.keras.activations.gelu),
        tf.keras.layers.Dense(proj, activation=tf.keras.activations.gelu),
    ])
    km.build((None, 6, proj))
    p = variables["params"]
    km.layers[0].set_weights([np.asarray(p["fc1"]["kernel"]),
                              np.asarray(p["fc1"]["bias"])])
    km.layers[1].set_weights([np.asarray(p["fc2"]["kernel"]),
                              np.asarray(p["fc2"]["bias"])])
    t_out = km(x).numpy()
    j_out = np.asarray(ff.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-3)


def test_layernorm_last_axis_parity():
    """TF-flavour blocks use standard last-axis LN (tf/functions.py:288-289)."""
    from flax import linen as nn

    feat = 16
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, feat)).astype(np.float32)
    scale = rng.normal(size=(feat,)).astype(np.float32)
    bias = rng.normal(size=(feat,)).astype(np.float32)

    tln = tf.keras.layers.LayerNormalization(epsilon=1e-6)
    tln.build((None, 5, feat))
    tln.set_weights([scale, bias])
    t_out = tln(x).numpy()

    jln = nn.LayerNorm(epsilon=1e-6)
    j_out = np.asarray(jln.apply(
        {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
        jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)
