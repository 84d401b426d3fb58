"""Native C++ preprocessing vs the numpy reference path."""

import numpy as np
import pytest

from rangeclip_tpu.data.transforms import _resize_nearest_np, lower_median_np
from rangeclip_tpu.native import (
    depth_transform_native,
    segmentation_resize_native,
    lib,
)


@pytest.mark.skipif(lib() is None, reason="native library unavailable")
def test_native_depth_transform_matches_numpy():
    rng = np.random.default_rng(0)
    for shape, size in [((37, 53), (24, 24)), ((480, 640), (224, 224)),
                        ((10, 10), (10, 10))]:
        d = rng.uniform(100, 5000, shape).astype(np.float32)
        got = depth_transform_native(d, size)
        resized = _resize_nearest_np(d, size)
        want = resized / lower_median_np(resized)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    zeros = np.zeros((8, 8), np.float32)
    assert depth_transform_native(zeros, (4, 4)).sum() == 0


@pytest.mark.skipif(lib() is None, reason="native library unavailable")
def test_native_segmentation_resize_matches_numpy():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 99, (123, 77)).astype(np.int32)
    got = segmentation_resize_native(s, (64, 224))
    np.testing.assert_array_equal(got, _resize_nearest_np(s, (64, 224)))
