"""Trainer subsystem tests: losses/metrics sanity, Fitter end-to-end on a
tiny synthetic denoising task, checkpoint save/reload, callbacks."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_unet_tpu.models.vit_unet import ViTUNet, ViTUNetConfig
from vit_unet_tpu.train.callbacks import EarlyStopping, JSONLLogger, ReduceLROnPlateau
from vit_unet_tpu.train.fitter import Fitter
from vit_unet_tpu.train.losses import charbonnier, mse, soft_dice_loss
from vit_unet_tpu.train.metrics import dice_score, precision_recall_f1, psnr, ssim


def test_losses_and_metrics_sanity(rng):
    a = jnp.asarray(rng.random((2, 3, 32, 32), dtype=np.float32))
    assert float(mse(a, a)) == 0.0
    assert float(charbonnier(a, a)) == pytest.approx(1e-3, rel=1e-3)
    assert float(soft_dice_loss(a, a)) == pytest.approx(
        1 - (2 * float(jnp.sum(a * a)) + 1) / (2 * float(jnp.sum(a)) + 1),
        rel=1e-4)
    assert float(psnr(a, a)) > 100.0
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert float(dice_score(a, a)) == pytest.approx(
        2 * float(jnp.sum(a * a)) / (2 * float(jnp.sum(a))), rel=1e-4)
    prf = precision_recall_f1(a, a)
    assert float(prf["f1"]) == pytest.approx(1.0)


def test_psnr_matches_definition(rng):
    pred = jnp.asarray(rng.random((2, 3, 16, 16), dtype=np.float32))
    target = jnp.asarray(rng.random((2, 3, 16, 16), dtype=np.float32))
    per_img = []
    for i in range(2):
        m = float(jnp.mean((pred[i] - target[i]) ** 2))
        per_img.append(10 * np.log10(1.0 / m))
    assert float(psnr(pred, target)) == pytest.approx(np.mean(per_img), rel=1e-5)


class SyntheticDenoise:
    """y = clean gradient image, x = y + noise."""

    def __init__(self, n=16, size=32, seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:size, 0:size] / size
        base = np.stack([yy, xx, yy * xx]).astype(np.float32)
        self.items = []
        for _ in range(n):
            noise = rng.normal(0, 0.05, base.shape).astype(np.float32)
            self.items.append({"x": base + noise, "y": base})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def small_fitter(tmp_path, **kw):
    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))
    return Fitter(model, learning_rate=3e-3, loss="mse", metrics=("psnr",),
                  checkpoint_dir=str(tmp_path), **kw)


def batches(ds, bs=8):
    from vit_unet_tpu.data.loader import DataLoader
    return DataLoader(ds, bs, shuffle=True, num_workers=0)


def test_fitter_end_to_end(tmp_path):
    ds = SyntheticDenoise()
    fitter = small_fitter(tmp_path)
    dl = batches(ds)
    history = fitter.fit(lambda: iter(dl), lambda: iter(dl), n_epochs=4,
                         verbose=False)
    assert history["loss"][-1] < history["loss"][0]
    assert "val_psnr" in history
    # best checkpoint written and reloadable
    assert os.path.isdir(os.path.join(str(tmp_path), "best-checkpoint"))
    step_before = int(fitter.state.step)
    params_before = jax.tree.leaves(fitter.state.params)[0]
    fitter.load()
    assert int(fitter.state.step) <= step_before
    # predict runs
    out = fitter.predict(np.stack([ds[0]["x"]]))
    assert out.shape == (1, 3, 32, 32)


def test_reduce_lr_and_early_stopping(tmp_path):
    ds = SyntheticDenoise(n=8)
    fitter = small_fitter(tmp_path)
    dl = batches(ds, bs=4)
    log_path = os.path.join(str(tmp_path), "log.jsonl")
    # patience 0 epochs won't trigger; use monitor that never improves
    cbs = [ReduceLROnPlateau(monitor="val_loss", patience=1, factor=0.5),
           EarlyStopping(monitor="val_loss", patience=2),
           JSONLLogger(log_path)]
    fitter.fit(lambda: iter(dl), lambda: iter(dl), n_epochs=3, callbacks=cbs,
               verbose=False)
    lr0 = 3e-3
    assert fitter.learning_rate <= lr0 * (1 + 1e-5)  # may have been reduced
    assert os.path.exists(log_path)
    with open(log_path) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) >= 1


def test_fitter_lr_setter(tmp_path):
    ds = SyntheticDenoise(n=4)
    fitter = small_fitter(tmp_path)
    dl = batches(ds, bs=4)
    fitter.fit(lambda: iter(dl), n_epochs=1, verbose=False)
    fitter.learning_rate = 1e-5
    assert fitter.learning_rate == pytest.approx(1e-5)
    # training still works after LR mutation
    fitter.fit(lambda: iter(dl), n_epochs=1, verbose=False)


def test_fitter_preemption_resume(tmp_path):
    """save_last + resume(): full-state periodic checkpoint restores params,
    optimizer state, step, best metric, and the epoch to continue from."""
    ds = SyntheticDenoise()
    fitter = small_fitter(tmp_path)
    dl = batches(ds)
    fitter.fit(lambda: iter(dl), lambda: iter(dl), n_epochs=2,
               save_last=True, verbose=False)
    step_after_2 = int(fitter.state.step)
    best_after_2 = fitter.best
    assert os.path.isdir(os.path.join(str(tmp_path), "last-checkpoint"))

    # simulate preemption: fresh fitter, same checkpoint_dir
    fitter2 = small_fitter(tmp_path)
    fitter2.init_state(next(iter(batches(ds))))
    start_epoch = fitter2.resume()
    assert start_epoch == 2
    assert int(fitter2.state.step) == step_after_2
    assert fitter2.best == pytest.approx(best_after_2)
    p1 = jax.tree.leaves(fitter.state.params)[0]
    p2 = jax.tree.leaves(fitter2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    # continue training from epoch 2
    hist = fitter2.fit(lambda: iter(dl), lambda: iter(dl), n_epochs=3,
                       save_last=True, initial_epoch=start_epoch,
                       verbose=False)
    assert int(fitter2.state.step) > step_after_2

    # resume with no checkpoint returns epoch 0
    fitter3 = small_fitter(tmp_path / "empty")
    fitter3.init_state(next(iter(batches(ds))))
    assert fitter3.resume() == 0


def test_predictor_and_export_roundtrip(tmp_path):
    """Serving: Predictor micro-batching + StableHLO export/load parity."""
    from vit_unet_tpu.serving import (Predictor, export_predictor,
                                      load_predictor)

    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 32, 32)))
    x = np.random.default_rng(0).normal(size=(5, 3, 32, 32)).astype(np.float32)

    pred = Predictor(model, variables, batch_size=2)
    out = pred(x)                     # 5 samples -> 3 compiled micro-batches
    assert out.shape == (5, 3, 32, 32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x),
                                 deterministic=True,
                                 use_running_average=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    single = pred(x[0])               # unbatched input round-trips
    np.testing.assert_allclose(single, ref[0], rtol=2e-5, atol=2e-5)

    path = str(tmp_path / "exported")
    export_predictor(model, variables, path, batch_size=2)
    fn = load_predictor(path)
    out2 = np.asarray(fn(x[:2]))
    np.testing.assert_allclose(out2, ref[:2], rtol=2e-5, atol=2e-5)


def test_segmentation_training_end_to_end(tmp_path):
    """Segmentation head (out_channels=1) + BCE loss + dice metric — the
    README's soft-Dice task (README.md:89-102) the reference never wired."""
    from vit_unet_tpu.train.losses import bce_with_logits
    from vit_unet_tpu.train.metrics import dice_score

    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="conv",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0, out_channels=1))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 3, 32, 32)).astype(np.float32)
    # mask correlated with the input so there is signal to learn
    y = (x.mean(axis=1, keepdims=True) > 0).astype(np.float32)

    def dice_on_sigmoid(pred, target):
        return dice_score(jax.nn.sigmoid(pred), target)
    dice_on_sigmoid.__name__ = "dice"

    fitter = Fitter(model, learning_rate=3e-3, loss=bce_with_logits,
                    metrics=(dice_on_sigmoid,), checkpoint_dir=str(tmp_path),
                    monitor="loss")
    data = [{"x": x[i:i + 8], "y": y[i:i + 8]} for i in (0, 8)]
    history = fitter.fit(data, n_epochs=5, verbose=False)
    assert history["loss"][-1] < history["loss"][0]
    pred = fitter.predict(x[:2])
    assert pred.shape == (2, 1, 32, 32)


def test_tf_orientation_model_trains():
    """The TF-flavour model (channels-last) through the sharded step
    machinery: loss decreases on the global-residual denoising task."""
    from vit_unet_tpu.models.hvit_unet_tf import get_hvit_unet_tf
    from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions

    model = get_hvit_unet_tf(img_size=32, patch_size=(8, 16),
                             transformer_layers=(1,), size_bottleneck=1,
                             num_heads=2)
    import optax
    tx = optax.adam(1e-3)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    from vit_unet_tpu.train.losses import mse
    steps = build_step_functions(model, tx, mse)
    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)), jnp.float32)
    noisy = clean + 0.1 * jnp.asarray(rng.normal(size=clean.shape), jnp.float32)
    batch = {"x": noisy, "y": clean}
    losses = []
    for _ in range(10):
        state, m = steps.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_predictor_edge_cases(tmp_path):
    """Empty batches, NHWC (TF-flavour) shape inference, and load-side
    micro-batching on the exported artifact."""
    from vit_unet_tpu.models.hvit_unet_tf import get_hvit_unet_tf
    from vit_unet_tpu.serving import (Predictor, export_predictor,
                                      load_predictor)

    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 32, 32)))
    pred = Predictor(model, variables, batch_size=2)
    empty = pred(np.zeros((0, 3, 32, 32), np.float32))
    assert empty.shape == (0, 3, 32, 32)

    # NHWC family: input shape inferred as (H, W, C)
    tfm = get_hvit_unet_tf(img_size=32, patch_size=(8, 16),
                           transformer_layers=(1,), size_bottleneck=1,
                           num_heads=2)
    tfv = jax.jit(tfm.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    tfp = Predictor(tfm, tfv, batch_size=2)
    assert tfp.input_shape == (32, 32, 3)
    out = tfp(np.zeros((3, 32, 32, 3), np.float32))
    assert out.shape == (3, 32, 32, 3)

    # exported artifact micro-batches any leading batch size
    path = str(tmp_path / "exp")
    export_predictor(model, variables, path, batch_size=2)
    fn = load_predictor(path)
    x = np.random.default_rng(0).normal(size=(5, 3, 32, 32)).astype(np.float32)
    got = np.asarray(fn(x))
    ref = np.asarray(model.apply(variables, jnp.asarray(x),
                                 deterministic=True,
                                 use_running_average=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fit_with_one_shot_iterator(tmp_path):
    """A one-shot generator works for a single epoch (the init probe batch is
    replayed); multi-epoch raises a clear error instead of silently training
    on nothing."""
    ds = SyntheticDenoise()
    batches_list = [ds[i] for i in range(4)]

    def one_shot():
        for b in batches_list:
            yield {"x": np.stack([b["x"]]), "y": np.stack([b["y"]])}

    fitter = small_fitter(tmp_path)
    hist = fitter.fit(one_shot(), n_epochs=1, verbose=False, save_best=False)
    # all 4 batches trained (the probe batch was not lost)
    assert int(fitter.state.step) == 4

    fitter2 = small_fitter(tmp_path)
    with pytest.raises(ValueError, match="one-shot iterator"):
        fitter2.fit(one_shot(), n_epochs=2, verbose=False, save_best=False)


def test_resume_without_init_state_raises(tmp_path):
    ds = SyntheticDenoise()
    fitter = small_fitter(tmp_path)
    dl = batches(ds)
    fitter.fit(lambda: iter(dl), n_epochs=1, save_last=True, verbose=False,
               save_best=False)
    fresh = small_fitter(tmp_path)
    with pytest.raises(ValueError, match="init_state"):
        fresh.resume()


def test_sample_weight_slot():
    """The reference's third dataset slot (torch/dataset.py:85-90 yields
    (x, y, w)): w=1 reproduces the unweighted loss; zero weights remove
    samples from the loss."""
    from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
    import optax

    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 3, 32, 32)))
    tx = optax.sgd(0.0)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.key(1))
    steps = build_step_functions(model, tx, mse, donate=False)
    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.normal(size=(4, 3, 32, 32)).astype(np.float32))
    y = x * 0.9

    out_plain = steps.eval_step(state, {"x": x, "y": y})
    out_ones = steps.eval_step(
        state, {"x": x, "y": y, "w": jnp.ones((4,))})
    np.testing.assert_allclose(float(out_ones["loss"]),
                               float(out_plain["loss"]), rtol=1e-5)

    # zeroing the last two samples == evaluating only the first two
    out_zero = steps.eval_step(
        state, {"x": x, "y": y, "w": jnp.asarray([1.0, 1.0, 0.0, 0.0])})
    out_first2 = steps.eval_step(state, {"x": x[:2], "y": y[:2]})
    np.testing.assert_allclose(float(out_zero["loss"]),
                               float(out_first2["loss"]), rtol=1e-5)

    # train_step accepts the slot too; w=1 matches the unweighted train
    # loss (train mode uses batch BN stats, so compare train vs train)
    _, m_w = steps.train_step(state, {"x": x, "y": y, "w": jnp.ones((4,))})
    _, m_now = steps.train_step(state, {"x": x, "y": y})
    np.testing.assert_allclose(float(m_w["loss"]), float(m_now["loss"]),
                               rtol=1e-5)


def test_eval_aggregation_is_sample_weighted():
    """_run_eval must weight per-batch means by batch size (a short final
    drop_remainder=False batch previously biased val metrics)."""
    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0))
    fitter = Fitter(model, loss="mse", metrics=())
    rng_np = np.random.default_rng(1)
    x = rng_np.normal(size=(6, 3, 32, 32)).astype(np.float32)
    y = np.zeros_like(x)
    fitter.init_state({"x": x[:1], "y": y[:1]})

    # batches of 4 + 2 (short remainder)
    batches = [{"x": x[:4], "y": y[:4]}, {"x": x[4:], "y": y[4:]}]
    got = fitter.evaluate(batches)["val_loss"]
    # ground truth: pooled per-sample mean over all 6 samples
    per_batch = [float(np.mean(np.square(
        np.asarray(fitter.predict(b["x"])) - b["y"]))) for b in batches]
    pooled = (per_batch[0] * 4 + per_batch[1] * 2) / 6
    biased = np.mean(per_batch)
    assert got == pytest.approx(pooled, rel=1e-4)
    assert abs(got - pooled) <= abs(got - biased)


def test_ssim_and_mixed_losses(rng):
    from vit_unet_tpu.train.losses import charbonnier_ssim, get_loss, ssim_loss

    a = jnp.asarray(rng.random((2, 3, 32, 32), dtype=np.float32))
    b = jnp.asarray(rng.random((2, 3, 32, 32), dtype=np.float32))
    assert float(ssim_loss(a, a)) == pytest.approx(0.0, abs=1e-5)
    assert float(ssim_loss(a, b)) > 0.1
    mixed = float(charbonnier_ssim(a, b))
    assert 0.0 < mixed < 2.0
    assert get_loss("ssim") is ssim_loss
    # differentiable (it's a training objective, not just a metric)
    g = jax.grad(lambda p: ssim_loss(p, b))(a)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_gradient_clip_and_accumulation(tmp_path):
    """gradient_clip_norm bounds the update; grad_accum_steps=k only steps
    the params every k micro-batches (optax.MultiSteps), and the LR
    setter/getter still reach the wrapped inject_hyperparams state."""
    import optax

    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 3, 32, 32)).astype(np.float32))
    batch = {"x": x, "y": x * 0.5}

    fitter = Fitter(model, learning_rate=1e-3, loss="mse", metrics=(),
                    checkpoint_dir=str(tmp_path), gradient_clip_norm=1.0,
                    grad_accum_steps=2)
    fitter.init_state(batch)

    # LR plumbing works through clip+MultiSteps wrappers
    assert fitter.learning_rate == pytest.approx(1e-3)
    fitter.learning_rate = 5e-4
    assert fitter.learning_rate == pytest.approx(5e-4)

    # snapshot before stepping: the train step donates the old state
    p0 = np.asarray(jax.tree.leaves(fitter.state.params)[0])
    fitter.state, m1 = fitter.steps.train_step(fitter.state, batch)
    p1 = np.asarray(jax.tree.leaves(fitter.state.params)[0])
    # first micro-batch of the accumulation pair: params unchanged
    np.testing.assert_array_equal(p0, p1)
    fitter.state, m2 = fitter.steps.train_step(fitter.state, batch)
    p2 = np.asarray(jax.tree.leaves(fitter.state.params)[0])
    assert np.abs(p2 - p1).max() > 0

    # clipping alone: the global update norm is bounded by ~lr * clip
    f2 = Fitter(model, learning_rate=1e-3, optimizer="sgd", loss="mse",
                metrics=(), checkpoint_dir=str(tmp_path),
                gradient_clip_norm=1e-3)
    f2.init_state(batch)
    q0 = [np.asarray(a) for a in jax.tree.leaves(f2.state.params)]
    f2.state, _ = f2.steps.train_step(f2.state, batch)
    q1 = [np.asarray(a) for a in jax.tree.leaves(f2.state.params)]
    delta = np.sqrt(sum(float(np.sum((b - a) ** 2))
                        for a, b in zip(q0, q1)))
    assert float(delta) <= 1e-3 * 1e-3 * 1.01   # lr * clip_norm


def test_ssim_channels_last_matches_nchw():
    """Regression (r3): channels-last inputs made the 11x11 VALID window
    exceed the 3-wide trailing axis and ssim returned NaN."""
    import numpy as np

    from vit_unet_tpu.train.metrics import ssim

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)), jnp.float32)
    b = jnp.clip(a + jnp.asarray(rng.normal(scale=0.1, size=a.shape),
                                 jnp.float32), 0, 1)
    v_nchw = float(ssim(a, b))
    v_nhwc = float(ssim(a.transpose(0, 2, 3, 1), b.transpose(0, 2, 3, 1)))
    assert np.isfinite(v_nchw) and 0 < v_nchw < 1
    np.testing.assert_allclose(v_nhwc, v_nchw, rtol=1e-5)
    assert float(ssim(a, a)) > 0.999


def test_dispatch_depth_bounded_queue(tmp_path):
    """The bounded dispatch queue (dispatch_depth) must aggregate exactly the
    same per-step metrics as an effectively-unbounded one — every step read
    back exactly once, in order, across epochs (including the drain of the
    final partial window)."""
    from vit_unet_tpu.data.loader import DataLoader

    ds = SyntheticDenoise()
    histories = []
    for depth in (1, 2, 1000):
        fitter = small_fitter(tmp_path, dispatch_depth=depth)
        dl = DataLoader(ds, 4, shuffle=False, num_workers=0)
        h = fitter.fit(lambda: iter(dl), n_epochs=2, verbose=False)
        histories.append(h["loss"])
    assert len(histories[0]) == 2
    for other in histories[1:]:
        np.testing.assert_allclose(histories[0], other, rtol=1e-6)


def test_async_save_then_load(tmp_path):
    """A non-blocking save must be committed by load()'s internal barrier —
    no explicit wait needed between save(block=False) and load()."""
    from vit_unet_tpu.data.loader import DataLoader

    ds = SyntheticDenoise()
    fitter = small_fitter(tmp_path)
    dl = DataLoader(ds, 4, shuffle=False, num_workers=0)
    fitter.fit(lambda: iter(dl), n_epochs=1, verbose=False, save_best=False)
    p = fitter.save("async-ckpt", block=False)
    fitter.load("async-ckpt")               # waits internally
    assert os.path.isdir(p)
    # a second async save to the same path serialises behind the first
    fitter.save("async-ckpt", block=False)
    fitter.finalize_checkpoints()
    fitter.load("async-ckpt")


def test_checkpoint_restore_across_mesh_topologies(tmp_path):
    """Elastic recovery across TOPOLOGY changes: a full-state checkpoint
    written by a DP=8 run restores onto a DP=4 x TP=2 mesh and training
    continues with the identical trajectory — preemption-safe restart does
    not require the original device layout.  (The reference's closest
    artifact re-initialises the TPU per fold and loses all state,
    ViT_UNet_TF_TPU.ipynb cell 23.)"""
    from vit_unet_tpu.parallel.mesh import create_mesh

    ds = SyntheticDenoise()
    dl = batches(ds)
    mesh_a = create_mesh(model_parallel=1, devices=jax.devices("cpu")[:8])
    fitter = small_fitter(tmp_path, mesh=mesh_a)
    fitter.fit(lambda: iter(dl), lambda: iter(dl), n_epochs=1,
               save_last=True, verbose=False)
    step_a = int(fitter.state.step)
    assert step_a > 0

    mesh_b = create_mesh(model_parallel=2, devices=jax.devices("cpu")[:8])
    fitter2 = small_fitter(tmp_path, mesh=mesh_b)
    fitter2.init_state(next(iter(batches(ds))))
    start = fitter2.resume()
    assert start == 1
    assert int(fitter2.state.step) == step_a
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        fitter.state.params, fitter2.state.params)

    # the SAME next step on both topologies advances the SAME trajectory
    # (reduction-order noise only: DP=8 vs DP=4 x TP=2 split the sums
    # differently).  Exception: the head-mix conv bias — its XLA-autodiff
    # gradient is pure cancellation residue (the bias reaches the BN input
    # directly and again through the batch mean, and the +x / -mu broadcast
    # paths cancel exactly under batch-stats BN; see docs/PERF.md), so its
    # SIGN flips with reduction order and Adam steps it a full ±lr either
    # way.  Every other leaf must match to f32 reduction noise.
    sb = next(iter(batches(ds, bs=8)))
    s1, m1 = fitter.steps.train_step(fitter.state, sb)
    s2, m2 = fitter2.steps.train_step(fitter2.state, sb)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    flat1, _ = jax.tree_util.tree_flatten_with_path(s1.params)
    for (path, a), b in zip(flat1, jax.tree.leaves(s2.params), strict=True):
        name = jax.tree_util.keystr(path)
        if "reatten_matrix" in name and "bias" in name:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-3 * 2.1)  # ±1 Adam step of lr
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-4, err_msg=name)
    # and the restored run is genuinely sharded over the new mesh
    fc1 = s2.params["Encoders_0"]["FeedForward"]["fc1"]["kernel"]
    assert len(fc1.sharding.device_set) == 8


def test_bn_freeze_epochs_warmup(tmp_path):
    """Frozen→batch-stats BN warmup (Fitter(bn_freeze_epochs=K)): during
    the frozen phase the BN running statistics are bitwise untouched (the
    train step runs use_running_average=True), after the flip they update;
    training stays finite across the flip."""
    ds = SyntheticDenoise(n=8)
    fitter = small_fitter(tmp_path, bn_freeze_epochs=2)
    dl = batches(ds, bs=4)
    fitter.init_state(next(iter(dl)))
    assert fitter.state.batch_stats, "model must carry BN stats"
    stats0 = jax.tree.map(np.asarray, fitter.state.batch_stats)

    # phase 1: frozen epochs only
    fitter.fit(lambda: iter(dl), n_epochs=2, verbose=False, save_best=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        stats0, fitter.state.batch_stats)

    # phase 2: continue into exact batch-stats epochs
    h = fitter.fit(lambda: iter(dl), n_epochs=4, initial_epoch=2,
                   verbose=False, save_best=False)
    leaves0 = jax.tree.leaves(stats0)
    leaves1 = [np.asarray(x) for x in jax.tree.leaves(fitter.state.batch_stats)]
    assert any(not np.array_equal(a, b) for a, b in zip(leaves0, leaves1)), \
        "running stats must update once the warmup flips to exact BN"
    assert np.isfinite(h["loss"]).all()

    # a permanently-frozen model has nothing to flip to
    frozen_model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, hidden_dim=16, num_heads=2,
        flash_frozen_bn=True))
    with pytest.raises(ValueError, match="bn_freeze_epochs"):
        Fitter(frozen_model, bn_freeze_epochs=1)


def test_inject_hyperparams_bf16_regression(tmp_path):
    """bf16 params + the Fitter's inject_hyperparams(adamw) optimizer: by
    default optax canonicalises hyperparams toward the params' dtype and
    b2=0.999 rounds to bf16(1.0), so the Adam bias correction divides by
    zero and every update is NaN after the first step (found on the TPU).
    The Fitter pins hyperparam_dtype=float32; updates must stay finite."""
    model = ViTUNet(ViTUNetConfig(
        depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
        im_size=32, patch_size=8, num_channels=3, hidden_dim=16, num_heads=2,
        attn_drop=0.0, proj_drop=0.0, linear_drop=0.0,
        dtype="bfloat16", param_dtype="bfloat16"))
    fitter = Fitter(model, learning_rate=3e-3, loss="mse", metrics=(),
                    checkpoint_dir=str(tmp_path))
    ds = SyntheticDenoise(n=8)
    dl = batches(ds, bs=4)
    h = fitter.fit(lambda: iter(dl), n_epochs=2, verbose=False,
                   save_best=False)
    assert np.isfinite(h["loss"]).all(), h["loss"]
    assert all(np.isfinite(np.asarray(p, np.float32)).all()
               for p in jax.tree.leaves(fitter.state.params))


class TestBNRefold:
    """Stat-matched BN refold (train/bn_refold.py): the frozen→exact-BN
    flip preserves the forward function exactly."""

    def _model_and_vars(self, **cfg_kw):
        model = ViTUNet(ViTUNetConfig(
            depth=1, depth_te=1, size_bottleneck=1, preprocessing="none",
            im_size=32, patch_size=8, num_channels=3, hidden_dim=16,
            num_heads=2, attn_drop=0.0, proj_drop=0.0, linear_drop=0.0,
            **cfg_kw))
        x = jax.random.normal(jax.random.key(0), (4, 3, 32, 32))
        variables = model.init(jax.random.key(1), x)
        return model, variables, x

    def test_refold_preserves_function(self):
        from vit_unet_tpu.train.bn_refold import bn_refold, estimate_bn_moments
        model, variables, x = self._model_and_vars()
        # de-trivialise the BN affine so the refold formulas are exercised
        from flax import traverse_util
        pflat = traverse_util.flatten_dict(variables["params"])
        for k in list(pflat):
            if k[-2] == "var_norm":
                key = jax.random.key(hash(k) % (2 ** 31))
                pflat[k] = pflat[k] + 0.3 * jax.random.normal(
                    key, pflat[k].shape, pflat[k].dtype)
        params = traverse_util.unflatten_dict(pflat)
        variables = {"params": params,
                     "batch_stats": variables["batch_stats"]}

        frozen_out = model.apply(variables, x, deterministic=True,
                                 use_running_average=True)
        moments = estimate_bn_moments(model, variables, [x])
        assert moments, "no reatten_matrix intermediates captured"
        p2, b2 = bn_refold(variables["params"], variables["batch_stats"],
                           moments, eps=model.config.attn_bn_eps)
        refolded = {"params": p2, "batch_stats": b2}
        # exact batch-stats forward on the SAME batch == frozen forward
        exact_out, _ = model.apply(refolded, x, deterministic=True,
                                   use_running_average=False,
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(exact_out),
                                   np.asarray(frozen_out),
                                   atol=5e-5, rtol=1e-4)
        # eval semantics (running averages = the measured moments) too
        eval_out = model.apply(refolded, x, deterministic=True,
                               use_running_average=True)
        np.testing.assert_allclose(np.asarray(eval_out),
                                   np.asarray(frozen_out),
                                   atol=5e-5, rtol=1e-4)

    def test_refold_no_bn_raises(self):
        from vit_unet_tpu.train.bn_refold import bn_refold
        with pytest.raises(ValueError, match="no var_norm"):
            bn_refold({"dense": {"kernel": jnp.ones((2, 2))}}, {}, {}, 1e-5)

    def test_fitter_refold_flip(self, tmp_path):
        """Fitter(bn_warmup='refold'): frozen epochs leave stats untouched,
        the flip refolds (stats move to the measured moments, optimizer
        state resets) and training continues finitely in exact semantics."""
        ds = SyntheticDenoise(n=8)
        fitter = small_fitter(tmp_path, bn_freeze_epochs=1,
                              bn_warmup="refold", bn_calib_batches=2)
        dl = batches(ds, bs=4)
        fitter.init_state(next(iter(dl)))
        stats0 = jax.tree.map(np.asarray, fitter.state.batch_stats)

        fitter.fit(lambda: iter(dl), n_epochs=1, verbose=False,
                   save_best=False)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            a, np.asarray(b)), stats0, fitter.state.batch_stats)

        h = fitter.fit(lambda: iter(dl), n_epochs=3, initial_epoch=1,
                       verbose=False, save_best=False)
        assert np.isfinite(h["loss"]).all()
        leaves1 = [np.asarray(v) for v in
                   jax.tree.leaves(fitter.state.batch_stats)]
        assert any(not np.array_equal(a, b) for a, b in
                   zip(jax.tree.leaves(stats0), leaves1)), \
            "refold must move the running stats to the measured moments"
        assert int(fitter.state.step) > 0
