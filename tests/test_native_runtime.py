"""C++ host-pipeline tests: build, parity vs cv2/numpy references, batch throughput."""

import numpy as np
import pytest

from projectiontrainer_tpu.runtime import native


@pytest.fixture(scope="module")
def lib_ok():
    ok = native.native_available()
    if not ok:
        pytest.skip("native pipeline library failed to build")
    return ok


def test_native_builds(lib_ok):
    assert native._get_lib().ptt_num_threads() >= 1


def test_resize_matches_cv2(lib_ok):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    ours = native.resize_bilinear(img, 24)
    ref = cv2.resize(img, (24, 24), interpolation=cv2.INTER_LINEAR)
    # identical grids; allow 1 LSB for rounding differences
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_fused_matches_fallback(lib_ok):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    for kwargs in [
        dict(),
        dict(flip=True),
        dict(zoom=1.08),
        dict(zoom=0.92),
        dict(dx=4.0, dy=-6.0),
        dict(contrast=1.15),
        dict(flip=True, zoom=1.05, dx=3.0, dy=2.0, contrast=0.9),
    ]:
        ours = native.fused_preprocess(img, 32, **kwargs)
        ref = native._fused_fallback(
            img, 32, kwargs.get("flip", False), kwargs.get("zoom", 1.0),
            kwargs.get("dx", 0.0), kwargs.get("dy", 0.0), kwargs.get("contrast", 1.0),
            1 / 255.0, 0.5, 0.5,
        )
        # bilinear implementations differ in rounding; tolerance = ~1.5/255 in [-1,1]
        assert np.abs(ours - ref).max() < 0.02, kwargs


def test_fused_identity_matches_plain_preprocess(lib_ok):
    """With no augmentation on an already-square image, fused == resize+normalize."""
    from projectiontrainer_tpu.data.image import preprocess

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    ours = native.fused_preprocess(img, 32)
    ref = preprocess(img, 32)
    np.testing.assert_allclose(ours, ref, atol=0.008)


def test_batch_matches_single(lib_ok):
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(40, 44, 3), dtype=np.uint8) for _ in range(5)]
    zooms = [1.0, 1.1, 0.9, 1.0, 1.05]
    flips = [0, 1, 0, 1, 0]
    batch = native.fused_preprocess_batch(imgs, 24, flips=flips, zooms=zooms)
    assert batch.shape == (5, 24, 24, 3)
    for i in range(5):
        single = native.fused_preprocess(
            imgs[i], 24, flip=bool(flips[i]), zoom=zooms[i]
        )
        np.testing.assert_array_equal(batch[i], single)


def test_elastic_warp_matches_scipy(lib_ok):
    """Native elastic warp == scipy map_coordinates(order=1, mode='reflect') exactly
    (same displacement fields), including far out-of-bounds displacements."""
    from scipy.ndimage import map_coordinates

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(45, 38, 3), dtype=np.uint8)
    h, w, c = img.shape
    # large alpha to push coordinates well past the borders
    dispy = (rng.random((h, w), dtype=np.float32) * 2 - 1) * 30.0
    dispx = (rng.random((h, w), dtype=np.float32) * 2 - 1) * 30.0

    ours = native.elastic_warp(img, dispy, dispx)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    iy = (ys + dispy.astype(np.float64)).reshape(-1)
    ix = (xs + dispx.astype(np.float64)).reshape(-1)
    ref = np.zeros_like(img)
    for k in range(c):
        ref[..., k] = map_coordinates(img[..., k], [iy, ix], order=1,
                                      mode="reflect").reshape(h, w)
    # float32 vs float64 coordinate math: allow 1 LSB on a tiny fraction of pixels
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_fused_elastic_matches_numpy_oracle(lib_ok):
    """Native fused elastic path == the numpy composition oracle (affine ->
    scipy-parity elastic -> bilinear resize+normalize)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(57, 49, 3), dtype=np.uint8)
    h, w, _ = img.shape
    dispy = (rng.random((h, w), dtype=np.float32) * 2 - 1) * 12.0
    dispx = (rng.random((h, w), dtype=np.float32) * 2 - 1) * 12.0
    for kwargs in [
        dict(),
        dict(flip=True, zoom=1.07, dx=3.0, dy=-2.0, contrast=1.1),
        dict(zoom=0.93, dx=-5.0, dy=4.0),
    ]:
        ours = native.fused_preprocess_elastic(img, 32, dispy, dispx, **kwargs)
        full = native._affine_contrast_fullres(
            img, kwargs.get("flip", False), kwargs.get("zoom", 1.0),
            kwargs.get("dx", 0.0), kwargs.get("dy", 0.0), kwargs.get("contrast", 1.0),
        )
        warped = native.elastic_warp(full, dispy, dispx)
        ref = native._bilinear_resize_normalize(warped, 32, 1 / 255.0, 0.5, 0.5)
        # cv2.remap vs native bilinear rounding: ~2 LSB tolerance in [-1,1] units
        assert np.abs(ours - ref).max() < 0.025, kwargs


def test_augment_fast_elastic_draw_uses_native(lib_ok, monkeypatch):
    """The p=0.2 elastic draw routes through the native fused elastic kernel (no
    cv2 op-by-op fallback) and returns a correctly-shaped normalized tensor."""
    from projectiontrainer_tpu.data import augmentation as A

    calls = {"elastic": 0}
    orig = native.fused_preprocess_elastic

    def spy(*a, **k):
        calls["elastic"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(native, "fused_preprocess_elastic", spy)
    rng = np.random.default_rng(11)
    img = np.random.default_rng(0).integers(0, 256, (64, 72, 3), dtype=np.uint8)
    got_elastic = False
    for _ in range(40):
        out = A.augment_and_preprocess_fast(img, 32, rng=rng)
        assert out.shape == (32, 32, 3) and out.dtype == np.float32
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
        if calls["elastic"]:
            got_elastic = True
            break
    assert got_elastic, "40 draws at p=0.2 should hit the elastic path"
