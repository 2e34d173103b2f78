"""Native C++ host library vs numpy fallbacks."""

import numpy as np
import pytest

from fbbev_tpu.ops import host_lib as H


@pytest.fixture(scope="module")
def native_available():
    if not H.have_native():
        pytest.skip("libfbbev_host.so not built and make unavailable")
    return True


def test_voxel_ranks_native_vs_numpy(rng, native_available):
    coor = (rng.rand(5000, 3) * 100 - 50).astype(np.float32)
    bi = rng.randint(0, 2, 5000).astype(np.int32)
    args = (coor, bi, [-40, -40, -1], [0.8, 0.8, 0.8], (100, 100, 8), 2)
    native = H.compute_voxel_ranks(*args)
    lib, H._lib = H._lib, None
    orig_load = H._load
    H._load = lambda: None
    try:
        fallback = H.compute_voxel_ranks(*args)
    finally:
        H._load = orig_load
        H._lib = lib
    np.testing.assert_array_equal(native, fallback)


def test_sort_intervals_native_vs_numpy(rng, native_available):
    ranks = rng.randint(0, 50, 1000).astype(np.int32)
    o1, r1, s1, l1 = H.sort_ranks_intervals(ranks)
    lib, H._lib = H._lib, None
    orig_load = H._load
    H._load = lambda: None
    try:
        o2, r2, s2, l2 = H.sort_ranks_intervals(ranks)
    finally:
        H._load = orig_load
        H._lib = lib
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(l1, l2)
    # stable sort -> identical order
    np.testing.assert_array_equal(o1, o2)


def test_rasterize_matches_transforms(rng, native_available):
    from fbbev_tpu.data.transforms import points_to_depth_map
    pts = np.stack([
        rng.rand(2000) * 40 - 4, rng.rand(2000) * 20 - 2,
        rng.rand(2000) * 50,
    ], -1).astype(np.float32)
    a = H.rasterize_depth(pts, 16, 32, (2.0, 42.0))
    b = points_to_depth_map(pts, 16, 32, (2.0, 42.0, 0.5))
    np.testing.assert_allclose(a, b)
