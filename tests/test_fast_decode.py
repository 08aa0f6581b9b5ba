"""DCT-downscaled JPEG decode (native imagepipe fast_scale mode).

Opt-in host-side optimization for the host-bound extraction input pipeline:
JPEGs decode at 1/d resolution in the DCT domain (d in {1,2,4,8}, keeping
the decoded short side >= the target), up to ~4x cheaper IDCT.  Pixels may
deviate from the exact full-res decode path at the few-intensity-level
scale, so the default stays full-res.
"""

import numpy as np
import pytest

from novel_vqa_tpu.data import native_images


pytestmark = pytest.mark.skipif(
    not native_images.available(), reason="native imagepipe not built"
)


@pytest.fixture(scope="module")
def jpeg_corpus(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("fastdec")
    rs = np.random.RandomState(0)
    paths = []
    # smooth photo-like content (block gradient + mild noise), 640x480
    for i in range(3):
        base = rs.rand(30, 40, 3)
        img = np.kron(base, np.ones((16, 16, 1)))
        img = (img * 220 + rs.rand(480, 640, 3) * 10).astype(np.uint8)
        p = str(tmp / f"im{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def test_fast_decode_close_to_exact(jpeg_corpus):
    exact, m1 = native_images.decode_batch_native(jpeg_corpus, 224, False, 2)
    fast, m2 = native_images.decode_batch_native(
        jpeg_corpus, 224, False, 2, fast_scale=True
    )
    assert not m1.any() and not m2.any()
    assert exact.shape == fast.shape
    diff = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    # smooth content: DCT-domain 1/2 decode then bilinear stays within a few
    # intensity levels of the full-res path
    assert diff.mean() < 3.0, diff.mean()
    # block edges see the largest deviation (bilinear from 1/2-res samples)
    assert np.percentile(diff, 99) <= 32


def test_fast_decode_off_is_bitwise_default(jpeg_corpus):
    a, _ = native_images.decode_batch_native(jpeg_corpus, 224, False, 2)
    b, _ = native_images.decode_batch_native(
        jpeg_corpus, 224, False, 2, fast_scale=False
    )
    np.testing.assert_array_equal(a, b)


def test_fast_decode_small_image_is_exact(tmp_path):
    """Images already near the target must not be downscaled (d stays 1)."""
    from PIL import Image

    rs = np.random.RandomState(1)
    p = str(tmp_path / "small.jpg")
    Image.fromarray(rs.randint(0, 255, size=(300, 260, 3), dtype=np.uint8)).save(
        p, quality=92
    )
    exact, _ = native_images.decode_batch_native([p], 224, False, 1)
    fast, _ = native_images.decode_batch_native([p], 224, False, 1, fast_scale=True)
    np.testing.assert_array_equal(exact, fast)


def test_decode_pool_fast_flag(jpeg_corpus):
    from novel_vqa_tpu.data.images import DecodePool

    pool = DecodePool(224, workers=2, fast_decode=True)
    batches = list(pool.iter_batches(jpeg_corpus, 3))
    pool.close()
    (u8, missing, real), = batches
    assert u8.shape == (3, 224, 224, 3) and real == 3 and not missing.any()
