"""Golden parity tests: JAX model vs the from-scratch torch oracle.

BASELINE.json target: outputs within 1e-4 of the torch ViT_UNet for the
canonical semantics.  Run in eval mode (dropout off, BatchNorm running stats)
— the reference's only stateful/dropout-free comparable mode.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.oracle import torch_oracle as TO
from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig
from vit_unet_tpu.nn.blocks import ReAttentionEncoderBlock
from vit_unet_tpu.nn.patch_encoder import PatchEncoder
from vit_unet_tpu.nn.reattention import ReAttention, SkipConnection
from vit_unet_tpu.utils.torch_import import import_torch_state_dict

TOL = 1e-4


def to_jax_vars(module: torch.nn.Module) -> dict:
    return jax.tree.map(jnp.asarray,
                        import_torch_state_dict(module.state_dict()))


def wrap_stats(variables: dict, flax_vars: dict) -> dict:
    """Ensure batch_stats collection exists (identity stats if torch had none)."""
    if "batch_stats" in flax_vars and "batch_stats" not in variables:
        variables["batch_stats"] = flax_vars["batch_stats"]
    return variables


@pytest.mark.parametrize("qkv_kernel", [1, 3])
def test_reattention_parity(rng, qkv_kernel):
    torch.manual_seed(0)
    dim, n, heads = 48, 16, 4
    tmod = TO.ReAttention(dim, num_heads=heads, qkv_kernel=qkv_kernel).eval()
    x = rng.standard_normal((2, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    jmod = ReAttention(dim=dim, num_heads=heads, qkv_kernel=qkv_kernel)
    ref_vars = jmod.init(jax.random.key(0), jnp.zeros((2, n, dim)))
    variables = {"params": to_jax_vars(tmod)["params"]}
    variables = wrap_stats(variables, ref_vars)
    # torch module tree has no wrapper prefix; flax params are at top level too
    got = np.asarray(jmod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_encoder_block_parity(rng):
    torch.manual_seed(1)
    n, proj, hidden, heads = 16, 48, 24, 4
    tmod = TO.ReAttentionTransformerEncoder(
        n, 3, proj, hidden, heads, 0.0, 0.0, 0.0).eval()
    x = rng.standard_normal((2, n, proj)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    jmod = ReAttentionEncoderBlock(
        num_patches=n, projection_dim=proj, hidden_dim=hidden, num_heads=heads)
    ref_vars = jmod.init(jax.random.key(0), jnp.zeros((2, n, proj)))
    variables = wrap_stats(to_jax_vars(tmod), ref_vars)
    got = np.asarray(jmod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_skip_connection_parity(rng):
    torch.manual_seed(2)
    dim, n, heads = 48, 16, 4
    tmod = TO.SkipConnection(dim, num_heads=heads).eval()
    q = rng.standard_normal((2, n, dim)).astype(np.float32)
    k = rng.standard_normal((2, n, dim)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(q), torch.from_numpy(k),
                    torch.from_numpy(k)).numpy()

    jmod = SkipConnection(dim=dim, num_heads=heads)
    ref_vars = jmod.init(jax.random.key(0), jnp.zeros((2, n, dim)),
                         jnp.zeros((2, n, dim)), jnp.zeros((2, n, dim)))
    sd = {f"attn.{k2}" if not k2.startswith("attn.") else k2: v
          for k2, v in tmod.state_dict().items()}
    variables = wrap_stats(
        jax.tree.map(jnp.asarray, import_torch_state_dict(sd)), ref_vars)
    got = np.asarray(jmod.apply(variables, jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(k)))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_patch_encoder_parity(rng):
    torch.manual_seed(3)
    tmod = TO.PatchEncoder(depth=2, num_patches=16, patch_size=16,
                           num_channels=3, preprocessing="conv").eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    jmod = PatchEncoder(depth=2, num_patches=16, patch_size=16)
    variables = to_jax_vars(tmod)
    got = np.asarray(jmod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


@pytest.mark.parametrize("qkv_kernel", [3, 1])
def test_full_model_parity(rng, qkv_kernel):
    """End-to-end eval-mode parity on a small-but-real hierarchy (depth 2)."""
    torch.manual_seed(4)
    kw = dict(depth=2, depth_te=1, size_bottleneck=1, preprocessing="conv",
              im_size=64, patch_size=16, num_channels=3, hidden_dim=32,
              num_heads=4, attn_drop=0.0, proj_drop=0.0, linear_drop=0.0)
    tmod = TO.ViTUNetOracle(**kw, qkv_kernel=qkv_kernel).eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    jmod = ViTUNet(ViTUNetConfig(**kw, qkv_kernel=qkv_kernel))
    ref_vars = jmod.init(jax.random.key(0), jnp.zeros((1, 3, 64, 64)))
    variables = wrap_stats(to_jax_vars(tmod), ref_vars)
    got = np.asarray(jax.jit(
        lambda v, a: jmod.apply(v, a))(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=TOL, rtol=1e-4)


def test_param_counts_match_readme():
    from vit_unet_tpu.models.vit_unet import get_vit_unet
    for name, want in [("lite", 3_387_568), ("base", 36_613_036),
                       ("large", 63_043_866)]:
        m = get_vit_unet(name)
        v = m.init(jax.random.key(0),
                   jnp.zeros((1, 3, m.config.im_size, m.config.im_size)))
        assert sum(x.size for x in jax.tree.leaves(v["params"])) == want


def test_global_residual_flag():
    """global_residual=True (the TF output form, tf/model.py:208): with
    zeroed final-conv params the model is the identity map."""
    cfg = ViTUNetConfig(depth=1, depth_te=1, size_bottleneck=1,
                        preprocessing="conv", im_size=32, patch_size=8,
                        hidden_dim=16, num_heads=2, attn_drop=0.0,
                        proj_drop=0.0, global_residual=True)
    model = ViTUNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x)
    params = jax.tree.map(jnp.zeros_like, variables["params"])
    out = model.apply({**variables, "params": params}, x,
                      deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="global_residual"):
        ViTUNetConfig(depth=1, depth_te=1, size_bottleneck=1, im_size=32,
                      patch_size=8, hidden_dim=16, num_heads=2,
                      out_channels=1, global_residual=True)


def test_residual_gain_extension():
    """residual_gain (framework extension): zero-init per-channel gain on
    the residual branch — the initial forward is EXACTLY the identity (the
    attractor CONVERGENCE.json documents), and the gain receives gradient
    so the correction branch can grow back."""
    cfg = ViTUNetConfig(depth=1, depth_te=1, size_bottleneck=1,
                        preprocessing="conv", im_size=32, patch_size=8,
                        hidden_dim=16, num_heads=2, attn_drop=0.0,
                        proj_drop=0.0, global_residual=True,
                        residual_gain=True)
    model = ViTUNet(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x)
    assert variables["params"]["residual_gain"].shape == (3,)
    out = model.apply(variables, x, deterministic=True,
                      use_running_average=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=0, atol=0)  # exact identity at init

    # gradient reaches the gain (the branch can re-grow)
    y = x * 0.5

    def loss(params):
        pred, _ = model.apply(
            {**variables, "params": params}, x, deterministic=False,
            use_running_average=False, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])
        return jnp.mean((pred - y) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["residual_gain"]).max()) > 0

    with pytest.raises(ValueError, match="residual_gain"):
        ViTUNetConfig(depth=1, depth_te=1, size_bottleneck=1, im_size=32,
                      patch_size=8, hidden_dim=16, num_heads=2,
                      residual_gain=True)  # requires global_residual


def test_input_skip_extension():
    """input_skip (framework extension): the raw input is concatenated with
    the decoded features before the output conv — output shape unchanged,
    extra conv input channels only, and the head has direct pixel access
    (zeroing every param except an identity output-conv tap on the input
    channels reproduces the input exactly)."""
    kw = dict(depth=1, depth_te=1, size_bottleneck=1, preprocessing="conv",
              im_size=32, patch_size=8, hidden_dim=16, num_heads=2,
              attn_drop=0.0, proj_drop=0.0)
    model = ViTUNet(ViTUNetConfig(**kw, input_skip=True))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x)
    # conv sees feature channels + 3 raw input channels
    k = variables["params"]["conv2d"]["kernel"]
    base = ViTUNet(ViTUNetConfig(**kw)).init(jax.random.key(0), x)
    k_base = base["params"]["conv2d"]["kernel"]
    assert k.shape[2] == k_base.shape[2] + 3
    out = model.apply(variables, x, deterministic=True,
                      use_running_average=True)
    assert out.shape == x.shape

    # direct pixel access: zero everything, set the conv's centre tap on
    # the raw-input channels to identity -> output == input
    params = jax.tree.map(jnp.zeros_like, variables["params"])
    eye = jnp.zeros_like(k)
    for c in range(3):
        eye = eye.at[1, 1, k.shape[2] - 3 + c, c].set(1.0)
    params["conv2d"]["kernel"] = eye
    got = model.apply({**variables, "params": params}, x,
                      deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_head_blocks_extension():
    """head_blocks (framework extension): a short nonlinear conv stack
    before the output conv — output shape unchanged, parameters present at
    the configured width, gradients reach every head conv, and
    head_blocks=0 (default) leaves the parameter tree identical to the
    baseline (pure extension, no parity impact)."""
    kw = dict(depth=1, depth_te=1, size_bottleneck=1, preprocessing="conv",
              im_size=32, patch_size=8, hidden_dim=16, num_heads=2,
              attn_drop=0.0, proj_drop=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    base = ViTUNet(ViTUNetConfig(**kw)).init(jax.random.key(0), x)
    model = ViTUNet(ViTUNetConfig(**kw, input_skip=True, head_blocks=2,
                                  head_dim=16))
    variables = model.init(jax.random.key(0), x)
    assert variables["params"]["head_0"]["kernel"].shape[-1] == 16
    assert variables["params"]["head_1"]["kernel"].shape[:2] == (3, 3)
    assert "head_0" not in base["params"]
    out = model.apply(variables, x, deterministic=True,
                      use_running_average=True)
    assert out.shape == x.shape

    def loss(params):
        pred, _ = model.apply(
            {**variables, "params": params}, x, deterministic=False,
            use_running_average=False, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])
        return jnp.mean(pred.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    for name in ("head_0", "head_1"):
        assert float(jnp.abs(g[name]["kernel"]).max()) > 0
