"""Convolution semantics: our NHWC/HWIO conv2d must equal caffe/torch
cross-correlation (scipy reference) so converted weights produce identical
features."""

import numpy as np
import jax.numpy as jnp
from scipy.signal import correlate2d

from novel_vqa_tpu.models.vision.layers import avg_pool, conv2d, max_pool


def test_conv2d_matches_scipy_cross_correlation():
    rs = np.random.RandomState(0)
    H = W = 6
    x = rs.randn(1, H, W, 2).astype(np.float32)
    w = rs.randn(3, 3, 2, 4).astype(np.float32)  # HWIO
    b = rs.randn(4).astype(np.float32)
    out = np.asarray(
        conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), relu=False)
    )
    assert out.shape == (1, H, W, 4)
    # scipy reference: SAME zero padding, cross-correlation per (in, out) pair
    for o in range(4):
        ref = np.zeros((H, W))
        for c in range(2):
            ref += correlate2d(x[0, :, :, c], w[:, :, c, o], mode="same")
        ref += b[o]
        np.testing.assert_allclose(out[0, :, :, o], ref, rtol=1e-4, atol=1e-5)


def test_conv2d_stride_valid():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 7, 7, 1).astype(np.float32)
    w = rs.randn(3, 3, 1, 1).astype(np.float32)
    out = np.asarray(
        conv2d(
            {"w": jnp.asarray(w), "b": jnp.zeros(1, np.float32)},
            jnp.asarray(x),
            stride=(2, 2),
            padding="VALID",
            relu=False,
        )
    )
    assert out.shape == (1, 3, 3, 1)
    full = correlate2d(x[0, :, :, 0], w[:, :, 0, 0], mode="valid")
    np.testing.assert_allclose(out[0, :, :, 0], full[::2, ::2], rtol=1e-4, atol=1e-5)


def test_pools():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    mp = np.asarray(max_pool(x))
    np.testing.assert_array_equal(mp[0, :, :, 0], [[5, 7], [13, 15]])
    ap = np.asarray(avg_pool(x, 2, 2, "VALID"))
    np.testing.assert_allclose(ap[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])
