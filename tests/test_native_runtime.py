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
