"""Adaptive tile-envelope boundary sweep (interpret mode on CPU).

The round-3 sweep rewrote ``ReAttention._flash_block`` into a multi-branch
pick table (640/512/256/128/64 tiles, padding N by up to +71%).  The shape
parity tests elsewhere pin ``block=128``; the shipped presets only exercise
the table at their own blessed geometries.  This sweep drives EVERY branch
of the pick table through the actual kernels at *awkward* token counts —
N just past a tile edge, N far below the tile, N an exact multiple — and
checks numerical parity against the naive references, i.e. it tests the
padding/masking logic of each tile class, not just the blessed shapes.

Reference behavior being re-implemented: the re-attention train/eval step
of /root/reference/vit_unet/torch/model.py:120-168 (semantics; the tiling
is ours alone).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_kernels import reference_reattention
from tests.test_kernels_train import (_bn_inputs, _random_inputs,
                                      xla_reference, xla_reference_bn)
from vit_unet_tpu.kernels.flash_reattention import flash_reattention
from vit_unet_tpu.kernels.flash_reattention_train import (
    flash_reattention_train, flash_reattention_train_bn)
from vit_unet_tpu.nn.reattention import ReAttention


# One case per branch of ReAttention._flash_block:
#   (heads, dh, n, expected_block)
ENVELOPE_CASES = [
    (2, 256, 200, 256),    # wide head (dh>192), single-k-tile
    (2, 256, 260, 64),     # wide head, multi-tile -> VMEM-safe 64
    (4, 12, 513, 640),     # long fine level: padded-waste pick favours 640
    (4, 12, 1024, 512),    # long fine level: exact 512 multiple
    (8, 48, 520, 512),     # thin heads (dh<=48, n>=512)
    (8, 96, 200, 256),     # mid level, single tile (n pads 200->256)
    (4, 96, 700, 256),     # mid level, multi tile (700 pads to 768)
    (8, 96, 320, 128),     # mid level padding worst case falls back to 128
]


@pytest.mark.parametrize("heads,dh,n,expected", ENVELOPE_CASES)
def test_block_pick_table(heads, dh, n, expected):
    mod = ReAttention(dim=heads * dh, num_heads=heads)
    assert mod._flash_block(n) == expected


@pytest.mark.parametrize("heads,dh,n_q,n_k,expected", [
    # sequence-parallel shapes: local query rows vs gathered tokens.
    # padded-AREA rule: lite fine 4-way (784 local, 3136 full) pads
    # 1024x3584 under 512 tiles vs 1280x3200 under 640 -> 512 wins
    (4, 12, 784, 3136, 512),
    (4, 12, 512, 4096, 512),    # nb512 fine 8-way
    (8, 48, 196, 784, 256),     # short local rows fall to the mid class
    (4, 12, 3136, 3136, 640),   # square case still reduces to the old rule
])
def test_block_pick_rectangular(heads, dh, n_q, n_k, expected):
    from vit_unet_tpu.kernels.flash_reattention import pick_flash_block
    assert pick_flash_block(n_q, n_k, num_heads=heads, dh=dh) == expected


def test_block_pick_bottleneck_mode_aware():
    """Round-5 rule: the bottleneck class (H8, dh24, N784) runs a SINGLE
    896 tile on the FROZEN TRAIN path only (-15% measured vs the 512
    grid).  Eval keeps 512 (measured ~20% slower at 896) and the
    batch-stats kernels keep 512 (still Mosaic-crash at 896) —
    tools/tile_bench.jsonl r5 rows, docs/PERF.md."""
    from vit_unet_tpu.kernels.flash_reattention import pick_flash_block
    assert pick_flash_block(784, num_heads=8, dh=24, train=True) == 896
    assert pick_flash_block(784, num_heads=8, dh=24) == 512          # eval
    assert pick_flash_block(784, num_heads=8, dh=24, train=True,
                            bn=True) == 512
    # the ReAttention wrapper threads the mode through
    mod = ReAttention(dim=192, num_heads=8)
    assert mod._flash_block(784, train=True) == 896
    assert mod._flash_block(784) == 512
    assert mod._flash_block(784, train=True, bn=True) == 512
    # fine levels (H4 rule fires first) are untouched by the new rule
    assert pick_flash_block(513, num_heads=4, dh=12, train=True) == 640


def test_sequence_parallel_flash_big_blocks():
    """The SP per-shard flash call now rides the swept tile envelope:
    parity vs the XLA shard body at a geometry whose pick is 512 tiles
    (local rows 512, gathered 1024)."""
    from vit_unet_tpu.parallel.mesh import create_mesh
    from vit_unet_tpu.parallel.sequence import sequence_parallel_reattention

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    mesh = create_mesh(model_parallel=2, devices=jax.devices()[:2])
    heads, dh, n = 4, 12, 1024
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(1, heads, n, dh)), jnp.float32) * .5
    k = jnp.asarray(rng.normal(size=(1, heads, n, dh)), jnp.float32) * .5
    v = jnp.asarray(rng.normal(size=(1, heads, n, dh)), jnp.float32)
    m_eff = jnp.asarray(rng.normal(size=(heads, heads)), jnp.float32) * 0.3
    c_eff = jnp.asarray(rng.normal(size=(heads,)), jnp.float32) * 0.1

    ref = sequence_parallel_reattention(q, k, v, m_eff, c_eff, mesh)
    out = sequence_parallel_reattention(q, k, v, m_eff, c_eff, mesh,
                                        use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("heads,dh,n,block", ENVELOPE_CASES)
def test_eval_kernel_parity_at_envelope(heads, dh, n, block):
    rng = np.random.default_rng(3)
    batch = 1
    q = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * .5
    k = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * .5
    v = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(heads, heads)), jnp.float32) * 0.3
    c = jnp.asarray(rng.normal(size=(heads,)), jnp.float32) * 0.1

    ref = reference_reattention(q, k, v, m, c)
    v_cat = v.transpose(0, 2, 1, 3).reshape(batch, n, heads * dh)
    w = jnp.repeat(m.T, dh, axis=1)
    b = jnp.repeat(c, dh)
    out = flash_reattention(q, k, v_cat, w, b, num_heads=heads,
                            block_q=block, block_k=block, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("heads,dh,n,block", ENVELOPE_CASES)
def test_train_kernel_parity_at_envelope(heads, dh, n, block):
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh, batch=1, seed=4)
    ref = xla_reference(q, k, v_cat, m_eff, c_eff, heads)
    out = flash_reattention_train(q, k, v_cat, m_eff, c_eff, 0,
                                  heads, 0.0, block, block, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("heads,dh,n,block", [
    (4, 12, 513, 640),     # lite-fine tile class, 127-row padded tail
    (8, 48, 520, 512),     # thin-head 512 class, 504-row padded tail
    (4, 96, 700, 256),     # mid 256 class, multi-tile with 68-row tail
    (2, 256, 260, 64),     # wide-proj 64 class, multi-tile
])
def test_train_grads_at_envelope(heads, dh, n, block):
    """Fused single-pass backward at every big-tile class with a padded
    tail tile in BOTH grid axes (the preset geometries pad much less)."""
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh, batch=1, seed=5)

    def loss_flash(q, k, v, m, c):
        out = flash_reattention_train(q, k, v, m, c, 0,
                                      heads, 0.0, block, block, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v, m, c):
        out = xla_reference(q, k, v, m, c, heads)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(
        q, k, v_cat, m_eff, c_eff)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        q, k, v_cat, m_eff, c_eff)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)


def test_bn_grads_at_512_tiles_awkward_n():
    """Through-the-statistics gradients at 512 tiles with a padded tail
    (N=520 -> 1024): the backward's G-mix and the per-row S/C residual
    slices must mask the padded rows/columns exactly like the forward.

    The oracle is ``jax.grad`` of the XLA reference IN FLOAT64: at this
    shape the f32 reference's own autodiff is catastrophically cancelled
    for ``conv_c`` (two broadcast paths, +chat and -mu, each sum ~2e5
    cotangent mass that must cancel to 1.0 — measured f32 result: values
    in [-13.7, 8.6] where the true gradient is exactly 1 per head).  The
    kernel's analytic VJP produces 1.0 to machine precision, so comparing
    against the f32 reference would fail on the REFERENCE's noise."""
    heads, dh, n, block = 8, 48, 520, 512
    q, k, v_cat, conv_m, conv_c, gamma, beta = _bn_inputs(
        n, heads, dh, batch=1, seed=8)

    def loss_flash(*args):
        out, mu, var = flash_reattention_train_bn(
            *args, 0, heads, 0.0, block, block, True)
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(mu) + jnp.sum(var)

    def loss_ref(*args):
        out, mu, var = xla_reference_bn(*args, heads)
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(mu) + jnp.sum(var)

    args = (q, k, v_cat, conv_m, conv_c, gamma, beta)
    g_flash = jax.grad(loss_flash, argnums=tuple(range(7)))(*args)
    with jax.enable_x64():
        args64 = [jnp.asarray(np.asarray(a), jnp.float64) for a in args]
        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args64)
    for gf, gr in zip(g_flash, g_ref):
        gf, gr = np.asarray(gf, np.float64), np.asarray(gr)
        scale = max(1.0, np.abs(gr).max())
        np.testing.assert_allclose(gf / scale, gr / scale,
                                   rtol=5e-4, atol=5e-4)


def test_bn_kernel_parity_at_512_tiles_awkward_n():
    """The exact batch-stats sweep at 512 tiles with N=520 (pads to 1024):
    the lane-chunked l/S/C accumulators must ignore the 504 padded columns
    and rows in the batch moments."""
    heads, dh, n, block = 8, 48, 520, 512
    q, k, v_cat, conv_m, conv_c, gamma, beta = _bn_inputs(
        n, heads, dh, batch=1, seed=6)
    ref, mu_ref, var_ref = xla_reference_bn(q, k, v_cat, conv_m, conv_c,
                                            gamma, beta, heads)
    out, mu, var = flash_reattention_train_bn(
        q, k, v_cat, conv_m, conv_c, gamma, beta, 0,
        heads, 0.0, block, block, True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)
    # atol 4e-3: measured against a float64 oracle at this shape, the f32
    # XLA reference itself is off by up to 2.6e-3 (mean 1.8e-4) while the
    # kernel is 5.6x closer (max 4.5e-4, identical at block 128 and 512) —
    # the gap here is the reference's reduction noise, not the kernel's.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=4e-3)


def test_fused_ghat_gate_per_preset_level():
    """The backward's dA/dV formulation choice is static per shape
    (flash_reattention_train._fused_ghat).  Pin the decision for every
    flash level of the shipped presets so a gate regression shows up as a
    test diff, not a silent perf change: fused wherever one proj-deep
    storage-dtype matmul issues no more MXU passes than the H dh-deep f32
    matmuls it replaces (conservative 3x f32 factor)."""
    from vit_unet_tpu.kernels.flash_reattention_train import _fused_ghat

    expected = {
        # (H, dh): fused?
        (4, 12): True,     # lite fine      proj 48
        (4, 48): True,     # lite mid       proj 192
        (4, 192): True,    # lite coarse    proj 768, dh needs 2 passes
        (8, 24): True,     # base/large bottleneck  proj 192
        (8, 96): False,    # base mid       proj 768 = 6 passes vs 3
        (16, 48): False,   # large mid      proj 768 = 6 passes vs 3
    }
    for (h, dh), want in expected.items():
        assert _fused_ghat(h, dh) is want, (h, dh)
