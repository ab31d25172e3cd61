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


def test_keras_mha_flash_parity_self_and_cross():
    """KerasMHA(use_flash=True): identity-affine flash kernel == the XLA
    einsum path, for self-attention and for the rectangular skip-connection
    cross-attention shape (query rows != key rows)."""
    from vit_unet_tpu.nn.mha import KerasMHA

    rng = np.random.default_rng(2)
    for n_q, n_k in [(256, 256), (64, 256)]:
        q_in = jnp.asarray(rng.normal(size=(2, n_q, 48)), jnp.float32)
        v_in = jnp.asarray(rng.normal(size=(2, n_k, 48)), jnp.float32)
        ref_m = KerasMHA(num_heads=4, key_dim=24, dropout=0.0)
        fl_m = KerasMHA(num_heads=4, key_dim=24, dropout=0.0,
                        use_flash=True)
        v = ref_m.init(jax.random.key(0), q_in, v_in)
        out_ref = ref_m.apply(v, q_in, v_in, deterministic=True)
        out_fl = fl_m.apply(v, q_in, v_in, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                                   rtol=2e-5, atol=2e-5)
        # training mode at dropout 0: the custom-VJP kernel's gradients
        loss = lambda m: lambda p: jnp.sum(m.apply(
            p, q_in, v_in, deterministic=False,
            rngs={"dropout": jax.random.key(1)}) ** 2)
        g_ref = jax.grad(loss(ref_m))(v)
        g_fl = jax.grad(loss(fl_m))(v)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fl)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_tf_model_flash_original_attn_parity():
    """The TF-flavour model's DEFAULT attention (keras MHA) rides the flash
    kernels end to end: encoder self-attention and the skip cross-attention
    all match the XLA path at a geometry above the token floor."""
    big = dict(img_size=128, patch_size=(8, 16), transformer_layers=(1,),
               size_bottleneck=1, num_heads=2, drop_attn=0.0,
               drop_proj=0.0, drop_linear=0.0)
    ref = get_hvit_unet_tf(**big)
    fl = get_hvit_unet_tf(**big, use_flash=True)
    v = jax.jit(ref.init)(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 128, 128, 3)),
                    jnp.float32)
    out_ref = jax.jit(lambda v_, x_: ref.apply(v_, x_))(v, x)
    out_fl = jax.jit(lambda v_, x_: fl.apply(v_, x_))(v, x)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                               rtol=5e-4, atol=5e-4)

    def loss(m):
        def f(p):
            y = m.apply(p, x, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
            return jnp.sum((y - 0.9 * x) ** 2)
        return f
    g_ref = jax.grad(loss(ref))(v)
    g_fl = jax.grad(loss(fl))(v)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_fl)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=jax.tree_util.keystr(kp))


def test_tf_model_residual_gain():
    """residual_gain extension on the TF model: initial forward is exactly
    the identity (zero-init gain on the decoded branch, tf/model.py:208
    output form), and the gain parameter exists per channel."""
    m = get_hvit_unet_tf(**SMALL, residual_gain=True)
    v = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert v["params"]["residual_gain"].shape == (3,)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    y = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)
