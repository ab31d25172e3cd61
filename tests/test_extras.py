"""Tests for inventory extras: softmax_top, batch transforms, seeding."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def test_softmax_top_matches_dense_restriction():
    from vit_unet_tpu.ops.sparse import softmax_top

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 16)), jnp.float32)
    top = 5
    out = softmax_top(x, top)
    arr = np.asarray(out)
    # exactly `top` nonzeros per row, summing to 1
    nz = (arr > 0).sum(-1)
    np.testing.assert_array_equal(nz, np.full(nz.shape, top))
    np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-5)
    # values equal softmax over the top-k subset
    row = np.asarray(x)[0, 0, 0]
    idx = np.argsort(row)[-top:]
    sub = np.exp(row[idx] - row[idx].max())
    sub = sub / sub.sum()
    np.testing.assert_allclose(np.sort(arr[0, 0, 0][idx]), np.sort(sub),
                               rtol=1e-5)
    # top >= width degenerates to plain softmax
    full = softmax_top(x, x.shape[-1])
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jax.nn.softmax(x, -1)), rtol=1e-6)


def test_mixup_cutmix_preserve_shapes_and_mass():
    from vit_unet_tpu.data.augment import batch_transforms, cutmix, mixup

    key = jax.random.key(0)
    b, c, h, w = 8, 3, 32, 32
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(b, c, h, w)),
                    jnp.float32)
    y = jax.nn.one_hot(jnp.arange(b) % 5, 5)

    mx, my = mixup(key, x, y, prob=1.0)
    assert mx.shape == x.shape and my.shape == y.shape
    np.testing.assert_allclose(np.asarray(my).sum(-1), 1.0, rtol=1e-5)

    cx, cy = cutmix(key, x, y, prob=1.0)
    assert cx.shape == x.shape and cy.shape == y.shape
    np.testing.assert_allclose(np.asarray(cy).sum(-1), 1.0, rtol=1e-5)
    # every pixel of the cutmix output comes from one of the two sources
    src = np.asarray(x)
    rolled = np.roll(src, 1, axis=0)
    carr = np.asarray(cx)
    is_from_either = np.isclose(carr, src) | np.isclose(carr, rolled)
    assert is_from_either.all()

    bx, by = batch_transforms(key, x, y)
    assert bx.shape == x.shape and by.shape == y.shape
    # jittable
    jx, jy = jax.jit(batch_transforms)(key, x, y)
    np.testing.assert_allclose(np.asarray(jx), np.asarray(bx), rtol=1e-6)


def test_seed_everything_reproducible():
    from vit_unet_tpu.utils.seeding import seed_everything

    k1 = seed_everything(123)
    a = np.random.rand(3)
    k2 = seed_everything(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(k1, (4,))),
        np.asarray(jax.random.uniform(k2, (4,))))


def test_visualization_utils(tmp_path):
    from vit_unet_tpu.utils.visualize import (pair_grid, plot_history,
                                              prediction_grid)

    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(4, 3, 16, 16)).astype(np.float32)
    fig = prediction_grid(imgs, imgs * 0.9, imgs,
                          path=str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").exists()
    import matplotlib.pyplot as plt
    plt.close(fig)

    hist = {"loss": [1.0, 0.5, 0.3], "val_loss": [1.1, 0.6, 0.4],
            "psnr": [10, 12, 14], "epoch_time_s": [1, 1, 1],
            "lr": [1e-4] * 3}
    fig = plot_history(hist, path=str(tmp_path / "hist.png"))
    assert (tmp_path / "hist.png").exists()
    plt.close(fig)

    gray = rng.uniform(size=(4, 16, 16)).astype(np.float32)
    fig = pair_grid(gray, gray, path=str(tmp_path / "pairs.png"))
    assert (tmp_path / "pairs.png").exists()
    plt.close(fig)
