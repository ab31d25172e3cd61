"""Smoke + behaviour tests for the TF-orientation model family."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_unet_tpu.models.hvit_unet_tf import HViTUNetTFConfig, get_hvit_unet_tf

SMALL = dict(img_size=64, patch_size=(8, 16, 32), transformer_layers=(1, 1),
             size_bottleneck=1, num_heads=2)


@pytest.mark.parametrize("kwargs", [
    dict(),                                              # standard resampling
    dict(resampling_type="max", projection_dim=192),
    dict(resampling_type="avg", projection_dim=192),
    dict(original_attn=False),
    dict(resampling_type="conv"),
])
def test_tf_model_forward(kwargs):
    m = get_hvit_unet_tf(**SMALL, **kwargs)
    v = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    y = jax.jit(lambda v_, x: m.apply(v_, x))(v, jnp.ones((2, 64, 64, 3)))
    assert y.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_tf_model_global_residual():
    """Output = input + decoded (tf/model.py:208): zero decoder params can't
    be arranged easily, but the residual must dominate for tiny weights."""
    m = get_hvit_unet_tf(**SMALL)
    v = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.full((1, 64, 64, 3), 7.0)
    y = m.apply(v, x)
    # residual passthrough present: output correlates with input offset
    assert float(jnp.mean(y)) > 3.0


def test_tf_config_validation():
    with pytest.raises(ValueError):
        HViTUNetTFConfig(patch_size=(16, 8, 32))       # not increasing
    with pytest.raises(ValueError):
        HViTUNetTFConfig(img_size=100, patch_size=(8, 16, 32))  # not divisible
    with pytest.raises(ValueError):
        HViTUNetTFConfig(resampling_type="max")        # needs projection_dim
    with pytest.raises(ValueError):
        HViTUNetTFConfig(resampling_type="standard", projection_dim=64)


def test_tf_reattention_uses_channels_last_patch_layout():
    """The TF-flavour re-attention must unflatten tokens channels-last
    (tf/functions.py:224-238): a conv over the patch image of a channels-last
    flattened token differs from the channel-major interpretation."""
    from vit_unet_tpu.nn.reattention import ReAttention

    c, p, heads = 3, 4, 4
    dim = c * p * p
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, dim)),
                    jnp.float32)
    cl = ReAttention(dim=dim, num_channels=c, num_heads=heads,
                     qkv_gelu=True, token_layout="cl", attn_drop=0.0,
                     proj_drop=0.0)
    cm = ReAttention(dim=dim, num_channels=c, num_heads=heads,
                     qkv_gelu=True, token_layout="cm", attn_drop=0.0,
                     proj_drop=0.0)
    v = cl.init(jax.random.key(0), x)
    out_cl = cl.apply(v, x)
    out_cm = cm.apply(v, x)
    # identical params, different patch-layout interpretation -> different out
    assert np.abs(np.asarray(out_cl) - np.asarray(out_cm)).max() > 1e-5


def test_tf_model_flash_variant_runs():
    m = get_hvit_unet_tf(img_size=64, patch_size=(8, 16),
                         transformer_layers=(1,), size_bottleneck=1,
                         num_heads=2, original_attn=False, use_flash=True)
    ref = get_hvit_unet_tf(img_size=64, patch_size=(8, 16),
                           transformer_layers=(1,), size_bottleneck=1,
                           num_heads=2, original_attn=False)
    v = jax.jit(ref.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    out_ref = ref.apply(v, x)
    out_fl = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
