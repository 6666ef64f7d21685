"""Native C++ data engine vs numpy/scipy semantics."""

import numpy as np
import pytest
from scipy import ndimage

from cardiax.native import (
    collate_pad,
    load_native,
    native_available,
    roll_stack,
    rotate_stack,
)


@pytest.fixture(scope="module", autouse=True)
def _built():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ compiler available to build the native engine")


def test_native_builds():
    assert native_available()


def test_rotate_nn_matches_scipy():
    rng = np.random.default_rng(0)
    mask = (rng.random((32, 32, 4)) > 0.6).astype(np.float32)
    for ang in (17.0, 90.0, -33.5):
        ours = rotate_stack(mask, ang, order=0)
        ref = ndimage.rotate(mask, ang, axes=(0, 1), reshape=False,
                             order=0, mode="constant", cval=0.0)
        # NN rounding ties may differ on exact-half coordinates; demand
        # near-identical otherwise
        frac_diff = np.mean(ours != ref)
        assert frac_diff < 0.02, f"angle {ang}: {frac_diff:.3f} pixels differ"


def test_rotate_bilinear_reasonable():
    rng = np.random.default_rng(1)
    img = ndimage.gaussian_filter(rng.normal(size=(32, 32)), 2).astype(np.float32)
    ours = rotate_stack(img, 25.0, order=1)
    ref = ndimage.rotate(img, 25.0, axes=(0, 1), reshape=False,
                         order=1, mode="constant", cval=0.0)
    # interiors must agree closely (borders differ by fallback policy)
    err = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4]).max()
    assert err < 0.05, err


def test_roll_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 16, 3)).astype(np.float32)
    ours = roll_stack(x, 3, -5)
    np.testing.assert_array_equal(ours, np.roll(x, (3, -5), axis=(0, 1)))
    ours2d = roll_stack(x[:, :, 0], -2, 7)
    np.testing.assert_array_equal(ours2d, np.roll(x[:, :, 0], (-2, 7), axis=(0, 1)))


def test_collate_pad():
    items = [np.full((2, 3), i, np.float32) for i in range(3)]
    out = collate_pad(items, 5)
    assert out.shape == (5, 2, 3)
    np.testing.assert_array_equal(out[2], items[2])
    np.testing.assert_array_equal(out[4], items[2])  # padded with last
