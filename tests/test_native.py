"""Native C++ preprocessing library: correctness vs the numpy reference."""

import numpy as np
import pytest

from lightning_generative_models_tpu.data import native
from lightning_generative_models_tpu.data.datamodule import (
    _center_crop_square,
    _prep_images,
    _resize_batch,
)

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


def test_integer_factor_matches_numpy_mean_pool():
    """For integer downsample factors the area filter equals mean pooling,
    which is exactly what the numpy path computes."""
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, size=(8, 64, 64, 3), dtype=np.uint8)
    ours = native.center_crop_resize_batch(imgs, 32)
    ref = _resize_batch(imgs, 32)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # rounding-only differences


def test_center_crop_alignment():
    """Non-square input: the crop window must match the numpy reference."""
    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 256, size=(4, 40, 64, 1), dtype=np.uint8)
    ours = native.center_crop_resize_batch(imgs, 40)  # crop 40x40, no resize
    ref = _center_crop_square(imgs)
    np.testing.assert_array_equal(ours, ref)


def test_identity_size():
    rs = np.random.RandomState(2)
    imgs = rs.randint(0, 256, size=(4, 28, 28, 1), dtype=np.uint8)
    out = native.center_crop_resize_batch(imgs, 28)
    np.testing.assert_array_equal(out, imgs)


def test_prep_images_dispatch():
    rs = np.random.RandomState(3)
    imgs = rs.randint(0, 256, size=(4, 178, 218, 3), dtype=np.uint8)
    out = _prep_images(imgs, 64)
    assert out.shape == (4, 64, 64, 3)
    assert out.dtype == np.uint8
