"""Native image pipeline (native/libimagepipe.so) vs the PIL path."""

import numpy as np
import pytest

from novel_vqa_tpu.data import images as I
from novel_vqa_tpu.data import native_images


pytestmark = pytest.mark.skipif(
    not native_images.available(), reason="libimagepipe.so not built"
)


@pytest.fixture
def jpegs(tmp_path):
    from PIL import Image

    paths = []
    rs = np.random.RandomState(0)
    for i, shape in enumerate([(50, 70, 3), (64, 64, 3), (120, 40, 3)]):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rs.randint(0, 255, shape, dtype=np.uint8)).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_decode_close_to_pil(jpegs):
    for p in jpegs:
        native, miss_n = native_images.decode_resize_native(p, 64)
        pil, miss_p = I.decode_resize(p, 64)
        assert not miss_n and not miss_p
        assert native.shape == pil.shape == (64, 64, 3)
        # decode + bilinear rounding differ slightly between libjpeg/PIL
        diff = np.abs(native.astype(int) - pil.astype(int))
        assert np.mean(diff) < 12, np.mean(diff)


def test_native_missing_file(tmp_path):
    img, missing = native_images.decode_resize_native(str(tmp_path / "no.jpg"), 32)
    assert missing and img.shape == (32, 32, 3)


def test_native_batch_and_pool(jpegs, tmp_path):
    paths = jpegs + [str(tmp_path / "no.jpg")]
    imgs, missing = native_images.decode_batch_native(paths, 48, n_threads=4)
    assert imgs.shape == (4, 48, 48, 3)
    assert list(missing) == [False, False, False, True]

    pool = I.DecodePool(48)
    assert pool.native is not None  # native path preferred when built
    batches = list(pool.iter_batches(paths, 3))
    pool.close()
    assert batches[0][2] == 3 and batches[1][2] == 1
    assert batches[1][1][0]  # missing flagged


def test_png_decode(tmp_path):
    from PIL import Image

    p = str(tmp_path / "x.png")
    rs = np.random.RandomState(1)
    Image.fromarray(rs.randint(0, 255, (40, 40, 4), dtype=np.uint8), "RGBA").save(p)
    native, miss = native_images.decode_resize_native(p, 32)
    assert not miss
    pil, _ = I.decode_resize(p, 32)
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert np.mean(diff) < 15


def test_degenerate_dims_and_upsampling(tmp_path):
    """1-pixel-wide/tall images and sources smaller than the target: the
    border taps must not read past the decode buffer and every upsampled
    output value must stay a valid uint8 (the bilinear border weights are
    clamped to [0,1] — extrapolating weights yielded out-of-[0,255] floats,
    UB on the uint8 cast)."""
    from PIL import Image

    rs = np.random.RandomState(3)
    cases = [(1, 50), (50, 1), (1, 1), (2, 2), (3, 224)]
    for i, (w, h) in enumerate(cases):
        arr = rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for ext in ("png", "jpg"):
            p = str(tmp_path / f"deg{i}.{ext}")
            Image.fromarray(arr).save(p)
            img, missing = native_images.decode_resize_native(
                p, 64, center_crop_square=False
            )
            assert not missing and img.shape == (64, 64, 3), (w, h, ext)
            # upsampled output must interpolate, never extrapolate: values
            # stay within the source's per-channel range (+/- jpeg noise)
            if ext == "png":
                for c in range(3):
                    assert img[..., c].min() >= arr[..., c].min(), (w, h, c)
                    assert img[..., c].max() <= arr[..., c].max(), (w, h, c)
