"""Property tests for the patch algebra (SURVEY.md §4: invertibility +
equivalence to a loop-based NumPy oracle of the reference semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vit_unet_tpu.ops import patches as P
from tests.oracle import numpy_patch_oracle as O


@pytest.mark.parametrize("p", [4, 8, 16])
def test_patchify_matches_oracle(rng, p):
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(P.patchify(jnp.asarray(x), p))
    want = O.patch_oracle(x, p)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [4, 8])
def test_unpatchify_roundtrip(rng, p):
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    pats = P.patchify(jnp.asarray(x), p)
    np.testing.assert_array_equal(np.asarray(P.unpatchify(pats)), x)


def test_unpatchify_matches_oracle(rng):
    pats = rng.standard_normal((2, 16, 3, 8, 8)).astype(np.float32)
    got = np.asarray(P.unpatchify(jnp.asarray(pats)))
    np.testing.assert_array_equal(got, O.unpatch_oracle(pats))


def test_flatten_unflatten_roundtrip(rng):
    pats = rng.standard_normal((2, 16, 3, 8, 8)).astype(np.float32)
    flat = P.flatten_patches(jnp.asarray(pats))
    assert flat.shape == (2, 16, 3 * 64)
    np.testing.assert_array_equal(np.asarray(P.unflatten(flat, 3)), pats)


def test_split_matches_downsampling_oracle(rng):
    # lite level-0 geometry: 16 patches of 8x8x3 -> 64 patches of 4x4x3
    x = rng.standard_normal((2, 16, 3 * 64)).astype(np.float32)
    got = np.asarray(P.split_patches(jnp.asarray(x), 3))
    want = O.downsampling_oracle(x, 3)
    np.testing.assert_array_equal(got, want)


def test_merge_matches_upsampling_oracle(rng):
    x = rng.standard_normal((2, 64, 3 * 16)).astype(np.float32)
    got = np.asarray(P.merge_patches(jnp.asarray(x), 3))
    want = O.upsampling_oracle(x, 3)
    np.testing.assert_array_equal(got, want)


def test_split_merge_inverse(rng):
    x = rng.standard_normal((2, 16, 3 * 64)).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(P.merge_patches(P.split_patches(xj, 3), 3)), x
    )
    np.testing.assert_array_equal(
        np.asarray(P.split_patches(P.merge_patches(xj, 3), 3)), x
    )


def test_change_patch_size_factor4_equals_twice_factor2(rng):
    x = rng.standard_normal((1, 4, 3 * 256)).astype(np.float32)
    xj = jnp.asarray(x)
    got = P.change_patch_size(xj, 3, down_factor=4)
    want = P.split_patches(P.split_patches(xj, 3), 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# --- TF flavour ---

@pytest.mark.parametrize("p", [4, 8])
def test_patchify_cl_matches_oracle(rng, p):
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(P.patchify_cl(jnp.asarray(x), p))
    np.testing.assert_array_equal(got, O.patches_cl_oracle(x, p))


def test_unpatchify_cl_roundtrip(rng):
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    pats = P.patchify_cl(jnp.asarray(x), 8)
    np.testing.assert_array_equal(np.asarray(P.unpatchify_cl(pats)), x)
    got = np.asarray(P.unpatchify_cl(jnp.asarray(O.patches_cl_oracle(x, 8))))
    np.testing.assert_array_equal(got, O.unpatch_cl_oracle(O.patches_cl_oracle(x, 8)))


def test_change_patch_size_cl_matches_tf_resampling_semantics(rng):
    # tf/functions.py:49-56 resampling == unpatch + re-patch in flat form
    x = rng.standard_normal((2, 16, 8 * 8 * 3)).astype(np.float32)
    xj = jnp.asarray(x)
    down = np.asarray(P.change_patch_size_cl(xj, 3, down_factor=2))
    img = O.unpatch_cl_oracle(
        np.asarray(x).reshape(2, 16, 8, 8, 3)
    )
    want = O.patches_cl_oracle(img, 4).reshape(2, 64, -1)
    np.testing.assert_array_equal(down, want)
    # invertibility
    back = np.asarray(P.change_patch_size_cl(jnp.asarray(down), 3, up_factor=2))
    np.testing.assert_array_equal(back, x)
