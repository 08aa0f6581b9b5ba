"""Vision stack tests: VGG/Inception shapes, prepro pixel math (incl. the
missing-file quirk), and the extraction CLI end-to-end on synthetic JPEGs."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novel_vqa_tpu.data import images as I
from novel_vqa_tpu.models.vision import vgg, inception


def test_vgg16_shapes_small():
    cfg = vgg.VGGConfig(arch="vgg16", image_size=32)
    params = vgg.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 32, 32, 3))
    feat = vgg.apply(params, cfg, x, tap="fc7")
    assert feat.shape == (2, 4096)
    assert float(jnp.min(feat)) >= 0.0  # post-ReLU tap
    logits = vgg.apply(params, cfg, x, tap="fc8")
    assert logits.shape == (2, 1000)


def test_vgg19_has_16_convs():
    cfg = vgg.VGGConfig(arch="vgg19", image_size=32)
    params = vgg.init_params(jax.random.PRNGKey(0), cfg)
    assert len(params["conv"]) == 16


def test_inception_shapes():
    cfg = inception.InceptionConfig()
    params = inception.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 299, 299, 3))
    feat = inception.apply(params, cfg, x, tap="pool")
    assert feat.shape == (1, 2048)


def test_inception_s2d_stem_equals_plain_conv():
    """The space-to-depth first stem conv (TPU fix for the C_in=3 conv —
    models/vision/inception._stem_conv_s2d) is an exact reassociation of the
    plain 3x3/stride-2 VALID conv: same outputs to float precision, with
    randomized BN stats and a non-even input size (299)."""
    rs = np.random.RandomState(0)
    p = inception._cbr_init(jax.random.PRNGKey(0), 3, 3, 3, 32)
    p["bn"] = {
        k: jnp.asarray(rs.rand(32).astype(np.float32) + (0.5 if k == "var" else 0.0))
        for k in p["bn"]
    }
    x = jnp.asarray(rs.randn(2, 299, 299, 3).astype(np.float32))
    plain = inception._cbr(p, x, stride=(2, 2), padding="VALID")
    s2d = inception._stem_conv_s2d(p, x)
    assert s2d.shape == plain.shape == (2, 149, 149, 32)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain), atol=2e-5)


def test_inception_packed_stem_conv_equals_plain():
    """Width-shift lane packing (inception._cbr_packed) is an exact
    reassociation of the plain 3x3/stride-1 conv+BN+ReLU: identical outputs
    to float precision for both stem users — c2 (VALID, C_out=32, s=4 over
    a width not divisible by 4) and c3 (SAME, C_out=64, s=2) — with
    randomized BN stats."""
    rs = np.random.RandomState(1)
    for co, padding, h in ((32, "VALID", 23), (64, "SAME", 21)):
        p = inception._cbr_init(jax.random.PRNGKey(co), 3, 3, 32, co)
        p["bn"] = {
            k: jnp.asarray(
                rs.rand(co).astype(np.float32) + (0.5 if k == "var" else 0.0)
            )
            for k in p["bn"]
        }
        x = jnp.asarray(rs.randn(2, h, h, 32).astype(np.float32))
        plain = inception._cbr(p, x, padding=padding)
        packed = inception._cbr_packed(p, x, padding=padding)
        assert packed.shape == plain.shape
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(plain), atol=2e-5
        )


def test_inception_pack_knob_end_to_end(monkeypatch):
    """NOVEL_VQA_INC_PACK=1 routes the stem through _cbr_packed and the
    full forward matches the default route."""
    cfg = inception.InceptionConfig()
    params = inception.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 299, 299, 3) * 0.1)
    x = x.astype(jnp.float32)
    monkeypatch.delenv("NOVEL_VQA_INC_PACK", raising=False)
    base = inception.apply(params, cfg, x, tap="pool")
    monkeypatch.setenv("NOVEL_VQA_INC_PACK", "1")
    packed = inception.apply(params, cfg, x, tap="pool")
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(base), atol=5e-4, rtol=1e-4
    )


def test_vgg_device_prepro_math():
    u8 = np.zeros((1, 2, 2, 3), np.uint8)
    u8[..., 0] = 200  # R
    u8[..., 1] = 150  # G
    u8[..., 2] = 100  # B
    out = np.asarray(I.vgg_device_prepro(jnp.asarray(u8), jnp.zeros((1,), bool)))
    # output channel order BGR with BGR means (loadim :66-69)
    np.testing.assert_allclose(out[0, 0, 0, 0], 100 - 103.939, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 0, 1], 150 - 116.779, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 0, 2], 200 - 123.68, rtol=1e-5)


def test_vgg_missing_quirk():
    u8 = np.zeros((2, 2, 2, 3), np.uint8)
    missing = np.asarray([True, False])
    out = np.asarray(I.vgg_device_prepro(jnp.asarray(u8), jnp.asarray(missing)))
    np.testing.assert_allclose(out[0, 0, 0], I.VGG_MISSING_BGR, rtol=1e-5)
    np.testing.assert_allclose(out[1, 0, 0, 0], -103.939, rtol=1e-5)


def test_inception_prepro_math():
    u8 = np.full((1, 2, 2, 3), 128, np.uint8)
    out = np.asarray(
        I.inception_device_prepro(jnp.asarray(u8), jnp.zeros((1,), bool))
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
    u8[:] = 255
    out = np.asarray(
        I.inception_device_prepro(jnp.asarray(u8), jnp.zeros((1,), bool))
    )
    np.testing.assert_allclose(out, 127 * 0.0078125, rtol=1e-5)


def test_decode_resize_and_pool(tmp_path):
    from PIL import Image

    paths = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.jpg")
        arr = np.full((50, 70, 3), 40 * (i + 1), np.uint8)
        Image.fromarray(arr).save(p)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))

    img, miss = I.decode_resize(paths[0], 224)
    assert img.shape == (224, 224, 3) and not miss
    _, miss = I.decode_resize(paths[-1], 224)
    assert miss

    pool = I.DecodePool(64)
    batches = list(pool.iter_batches(paths, 3))
    pool.close()
    assert len(batches) == 2
    assert batches[0][2] == 3 and batches[1][2] == 1
    assert batches[1][0].shape == (3, 64, 64, 3)  # padded to batch
    assert batches[1][1][0]  # the missing file


def test_extract_cli_end_to_end(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = []
    rs = np.random.RandomState(0)
    for i in range(3):
        name = f"im{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (60, 60, 3), dtype=np.uint8)).save(
            str(img_dir / name)
        )
        names.append(name)

    meta = {
        "unique_img_train": names,
        "unique_img_val": names[:2],
        "unique_img_test": names[:1],
    }
    meta_path = str(tmp_path / "data_prepro.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    out_h5 = str(tmp_path / "data_img.h5")
    from novel_vqa_tpu.train import extract_features

    extract_features.main(
        [
            "--input_json", meta_path,
            "--image_root", str(img_dir) + "/",
            "--model", "vgg16",
            "--batch_size", "2",
            "--out_name", out_h5,
        ]
    )
    import h5py

    with h5py.File(out_h5) as f:
        assert f["images_train"].shape == (3, 4096)
        assert f["images_val"].shape == (2, 4096)
        assert f["images_test"].shape == (1, 4096)
        assert f["images_train"].dtype == np.float32
        # deterministic: same image -> same features in each split
        np.testing.assert_allclose(
            f["images_train"][0], f["images_test"][0], rtol=1e-5
        )


def test_extract_early_fusion_concat(tmp_path):
    """--model2 concatenates a second net's features (001_prepro_img_ef.lua)."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rs = np.random.RandomState(3)
    names = []
    for i in range(2):
        name = f"im{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (50, 50, 3), dtype=np.uint8)).save(
            str(img_dir / name)
        )
        names.append(name)
    meta_path = str(tmp_path / "meta.json")
    with open(meta_path, "w") as f:
        json.dump({"unique_img_train": names}, f)

    out_h5 = str(tmp_path / "ef.h5")
    from novel_vqa_tpu.train import extract_features

    extract_features.main(
        [
            "--input_json", meta_path,
            "--image_root", str(img_dir) + "/",
            "--model", "vgg16",
            "--model2", "vgg16",
            "--weights2", "",
            "--batch_size", "2",
            "--out_name", out_h5,
        ]
    )
    import h5py

    with h5py.File(out_h5) as f:
        feats = f["images_train"][()]
    assert feats.shape == (2, 8192)  # 4096 + 4096 concat
    # same random seed -> both halves equal (the concat plumbing is what's
    # under test; different nets/weights produce different halves)
    np.testing.assert_allclose(feats[:, :4096], feats[:, 4096:], rtol=1e-5)


def test_inception_branch_fusion_equivalence(monkeypatch):
    """The same-input 1x1 branch fusion (inception._cbr_multi) computes every
    output channel with the identical contraction as the separate convs, and
    BN/ReLU are per-channel — outputs must match the unfused path to float
    tolerance (docs/PERF.md Inception record, VERDICT round-3 item 4)."""
    cfg = inception.InceptionConfig(image_size=299)
    params = inception.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 299, 299, 3), jnp.float32)

    monkeypatch.setenv("NOVEL_VQA_INC_FUSE", "1")
    fused = np.asarray(inception.apply(params, cfg, x, tap="pool"))
    monkeypatch.setenv("NOVEL_VQA_INC_FUSE", "0")
    unfused = np.asarray(inception.apply(params, cfg, x, tap="pool"))
    np.testing.assert_allclose(fused, unfused, rtol=1e-5, atol=1e-5)


def test_inception_bf16_storage_differentiable():
    """bf16-storage Inception must stay differentiable: the weak-paired
    finetune (`--cnn_arch inception --compute_dtype bfloat16`) takes grads
    through the trunk, and pinning ``preferred_element_type=f32`` on a
    bf16-weight conv makes the conv TRANSPOSE rule reject the f32 cotangent
    (see layers.conv2d / inception._cbr).  Exercises the fused-GEMM
    _cbr_multi path (incl. the pool branch) on one InceptionA block."""
    from novel_vqa_tpu.models.vision.layers import bf16_storage_cast

    kg_key = [jax.random.PRNGKey(7)]

    def kg():
        kg_key[0], k = jax.random.split(kg_key[0])
        return k

    p = inception._inception_a_init(kg, 16, 8)
    p_bf = bf16_storage_cast(p)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 9, 9, 16), jnp.float32)

    def loss(params, x):
        return jnp.sum(inception._inception_a(params, x).astype(jnp.float32))

    gp, gx = jax.grad(loss, argnums=(0, 1))(p_bf, x)
    assert all(
        np.isfinite(np.asarray(g, np.float32)).all()
        for g in jax.tree_util.tree_leaves(gp)
    )
    assert np.isfinite(np.asarray(gx)).all()
