"""Host-side image decode/resize + device-side normalization.

Split of responsibilities (TPU-first): the host decodes and resizes to uint8
RGB (PIL, or the native C++ pipeline in ``native/`` when built), and ships
*uint8* to the device — 4x less host->device bandwidth than float32; the
float conversion, channel reorder, and mean subtraction run on-device inside
the jitted extractor (``vgg_device_prepro`` / ``inception_device_prepro``).

The pixel math reproduces the reference extractors:
  * VGG (002_train_vqa_arch1/001_prepro_img_vgg.lua:47-71 ``loadim``):
    [0,1] float load -> bilinear scale to 224x224 -> grayscale replicate /
    RGBA drop -> x255 -> output channels (B-103.939, G-116.779, R-123.68);
    a *missing* file produces the reference's literal quirk image — the mean
    fill is built before the x255+swap and flows through them (:52-57), giving
    channels (26400.5, 29661.9, 31414.7);
  * Inception (001_prepro_img_inc.lua:47-57): 3-channel load -> center-crop
    to the short side -> scale to 299 -> (x*255 - 128) * 0.0078125, RGB order.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence, Tuple

import numpy as np

VGG_MEAN_BGR = (103.939, 116.779, 123.68)
# the missing-file quirk constants (see module docstring), channel order BGR
VGG_MISSING_BGR = (
    103.939 * 255.0 - 103.939,
    116.779 * 255.0 - 116.779,
    123.68 * 255.0 - 123.68,
)


def decode_resize(
    path: str, size: int, center_crop_square: bool = False
) -> Tuple[np.ndarray, bool]:
    """Decode + resize to (size, size, 3) uint8 RGB.  Returns (img, missing)."""
    from PIL import Image

    if not os.path.exists(path):
        return np.zeros((size, size, 3), np.uint8), True
    with Image.open(path) as im:
        if im.mode != "RGB":
            im = im.convert("RGB")
        if center_crop_square:
            w, h = im.size
            m = min(w, h)
            left, top = (w - m) // 2, (h - m) // 2
            im = im.crop((left, top, left + m, top + m))
        im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.uint8), False


class DecodePool:
    """Threaded decode pool with double-buffered batch prefetch.

    The reference decodes serially on the host while the GPU idles
    (001_prepro_img_vgg.lua:101-113, SURVEY.md section 3.3); here batch i+1
    decodes while the device runs batch i."""

    def __init__(
        self,
        size: int,
        center_crop_square: bool = False,
        workers: int = 8,
        use_native: bool = True,
        fast_decode: bool = False,
        prefetch_depth: int = 3,
    ):
        self.size = size
        self.center_crop_square = center_crop_square
        self.workers = workers
        # DCT-downscaled JPEG decode (native path only): up to ~4x cheaper
        # on the host, pixel deviation at the few-intensity-level scale —
        # opt-in; the default decodes full-res like the reference's loadim
        self.fast_decode = fast_decode
        # batches decoded AHEAD of the consumer: a deeper queue keeps the
        # decode threads busy while the consumer blocks on a device fetch
        # (each decoded batch buffers size^2*3*B bytes — ~19 MB at 224/128)
        self.prefetch_depth = max(1, prefetch_depth)
        self.pool = ThreadPoolExecutor(max_workers=2)  # batch-level prefetch
        if use_native:
            from novel_vqa_tpu.data import native_images

            self.native = native_images if native_images.available() else None
        else:
            self.native = None

    def _decode_batch(self, paths: Sequence[str]):
        if self.native is not None:
            return self.native.decode_batch_native(
                list(paths), self.size, self.center_crop_square, self.workers,
                fast_scale=self.fast_decode,
            )
        results = [
            decode_resize(p, self.size, self.center_crop_square) for p in paths
        ]
        imgs = np.stack([r[0] for r in results])
        missing = np.asarray([r[1] for r in results], bool)
        return imgs, missing

    def iter_batches(
        self, paths: Sequence[str], batch_size: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        """Yields (uint8 batch, missing mask, real_count); the final batch is
        padded to batch_size by repeating the first row (static shapes for
        jit)."""
        from collections import deque

        chunks = [
            paths[i : i + batch_size] for i in range(0, len(paths), batch_size)
        ]
        if not chunks:
            return
        futures: "deque" = deque()
        next_ci = 0
        while next_ci < min(self.prefetch_depth, len(chunks)):
            futures.append(self.pool.submit(self._decode_batch, chunks[next_ci]))
            next_ci += 1
        while futures:
            imgs, missing = futures.popleft().result()
            if next_ci < len(chunks):
                futures.append(self.pool.submit(self._decode_batch, chunks[next_ci]))
                next_ci += 1
            real = imgs.shape[0]
            if real < batch_size:
                pad = batch_size - real
                imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, 0)])
                missing = np.concatenate([missing, np.zeros(pad, bool)])
            yield imgs, missing, real

    def close(self):
        self.pool.shutdown()


def vgg_device_prepro(u8_rgb, missing):
    """(N, H, W, 3) uint8 RGB + missing mask -> BGR mean-subtracted float32.
    Runs on device under jit."""
    import jax.numpy as jnp

    x = u8_rgb.astype(jnp.float32)
    bgr = jnp.stack(
        [
            x[..., 2] - VGG_MEAN_BGR[0],
            x[..., 1] - VGG_MEAN_BGR[1],
            x[..., 0] - VGG_MEAN_BGR[2],
        ],
        axis=-1,
    )
    quirk = jnp.asarray(VGG_MISSING_BGR, jnp.float32)
    return jnp.where(missing[:, None, None, None], quirk, bgr)


def inception_device_prepro(u8_rgb, missing):
    """(N, H, W, 3) uint8 RGB -> (x - 128) * 0.0078125 float32 (RGB order)."""
    import jax.numpy as jnp

    x = u8_rgb.astype(jnp.float32)
    return (x - 128.0) * 0.0078125


def torchvision_device_prepro(u8_rgb, missing):
    """(N, H, W, 3) uint8 RGB -> torchvision ImageNet normalization:
    x/255 minus mean (0.485, 0.456, 0.406) over std (0.229, 0.224, 0.225).
    Use with weights imported via train/import_pth.py — NOT reference-parity
    prepro (the reference's VGG pipeline is BGR 0-255 mean-sub)."""
    import jax.numpy as jnp

    x = u8_rgb.astype(jnp.float32) / 255.0
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    return (x - mean) / std
