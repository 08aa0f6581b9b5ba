"""Weak-paired (caption) data loader.

Port of 001_train_autoencoder/misc/DataLoaderWeakPaired.lua: the corpus-h5
sequential-with-wrap batching plus raw ``/images/<split>`` 3x256x256 byte
images streamed per batch (:72,:82-99).  Images ship to device as uint8 and
the crop + mean-subtract runs on-device (``prepro_wp_images``), matching
net_utils.prepro (misc/net_utils.lua:143-176): random 224-crop at train /
center crop at eval, then RGB VGG-mean subtraction (the CNN here is the
BGR->RGB-swapped build_cnn, net_utils.lua:25-33, so inputs stay RGB).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from novel_vqa_tpu.data.corpus import CorpusLoader

VGG_MEAN_RGB = (123.68, 116.779, 103.939)


class WeakPairedLoader(CorpusLoader):
    def get_batch_with_images(
        self, split: str, batch_size: int
    ) -> Tuple[np.ndarray, np.ndarray, dict]:
        """Returns (labels (L, N) int32, images (N, H, W, 3) uint8, bounds)."""
        ds = self.h5[f"labels/{split}"]
        ims = self.h5[f"images/{split}"]
        max_index = self.split_count[split]
        it = self.iterators[split]
        wrapped = False
        if it + batch_size > max_index:
            wrapped = True
            if it < max_index - 1:
                label_batch = np.concatenate([ds[it:max_index], ds[0 : batch_size - (max_index - it)]])
                img_batch = np.concatenate([ims[it:max_index], ims[0 : batch_size - (max_index - it)]])
            else:
                label_batch = ds[0:batch_size]
                img_batch = ims[0:batch_size]
            self.iterators[split] = 0
        else:
            label_batch = ds[it : it + batch_size]
            img_batch = ims[it : it + batch_size]
            self.iterators[split] = it + batch_size
        labels = np.ascontiguousarray(label_batch.astype(np.int32).T)
        # reference stores CHW (3, 256, 256); convert to NHWC uint8 for device
        img_batch = np.asarray(img_batch)
        if img_batch.ndim == 4 and img_batch.shape[1] == 3:
            img_batch = np.transpose(img_batch, (0, 2, 3, 1))
        bounds = {
            "it_pos_now": self.iterators[split],
            "it_max": max_index,
            "wrapped": wrapped,
        }
        return labels, img_batch.astype(np.uint8), bounds


def prepro_wp_images(u8_rgb, crop_offsets, crop_size: int = 224):
    """Device-side crop + RGB mean subtraction (net_utils.prepro).

    ``crop_offsets`` is an (N, 2) int array of (row, col) crop origins chosen
    on host — random at train, centered at eval."""
    import jax
    import jax.numpy as jnp

    def crop_one(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (crop_size, crop_size, img.shape[2])
        )

    cropped = jax.vmap(crop_one)(u8_rgb, crop_offsets)
    x = cropped.astype(jnp.float32)
    return x - jnp.asarray(VGG_MEAN_RGB, jnp.float32)


def random_crop_offsets(rng: np.random.Generator, n: int, src: int, dst: int):
    return rng.integers(0, src - dst + 1, size=(n, 2)).astype(np.int32)


def center_crop_offsets(n: int, src: int, dst: int):
    off = (src - dst) // 2
    return np.full((n, 2), off, np.int32)
