"""Torch7 serialization: reader/writer roundtrips, wire-format details, and
the t7 import CLI."""

import io
import struct

import numpy as np
import pytest

from novel_vqa_tpu.core import t7


def roundtrip(obj):
    buf = io.BytesIO()
    t7.T7Writer(buf).write_object(obj)
    buf.seek(0)
    return t7.T7Reader(buf).read_object()


def test_scalars_and_strings():
    assert roundtrip(None) is None
    assert roundtrip(3) == 3
    assert roundtrip(2.5) == 2.5
    assert roundtrip(True) is True
    assert roundtrip("hello") == "hello"


def test_tables_and_arrays():
    assert roundtrip({"a": 1, "b": [1, 2, 3]}) == {"a": 1, "b": [1, 2, 3]}
    # Lua-array convention: 1..n integer keys listify
    assert roundtrip([10, 20, 30]) == [10, 20, 30]


def test_tensor_roundtrip():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = roundtrip(arr)
    np.testing.assert_array_equal(out, arr)
    out64 = roundtrip(arr.astype(np.int64))
    assert out64.dtype == np.int64


def test_flat_checkpoint_roundtrip(tmp_path):
    vectors = {
        "encoder_w_q": np.random.RandomState(0).randn(100).astype(np.float32),
        "embedding_w_q": np.random.RandomState(1).randn(50).astype(np.float32),
        "multimodal_w": np.random.RandomState(2).randn(70).astype(np.float32),
    }
    path = str(tmp_path / "lstm.t7")
    t7.save(path, vectors)
    back = t7.load(path)
    for k in vectors:
        np.testing.assert_array_equal(back[k], vectors[k])


def test_wire_format_header(tmp_path):
    """The first bytes of a NUMBER must be int32 typecode 1 + little-endian
    double — the exact Torch7 layout."""
    path = str(tmp_path / "n.t7")
    t7.save(path, 7.0)
    raw = open(path, "rb").read()
    assert struct.unpack("<i", raw[:4])[0] == 1
    assert struct.unpack("<d", raw[4:12])[0] == 7.0


def test_strided_tensor_read():
    """A transposed (non-contiguous stride) tensor must read correctly."""
    buf = io.BytesIO()
    w = t7.T7Writer(buf)
    # hand-write a 2x3 FloatTensor with column-major strides over a 6-elem
    # storage => reads as the transpose of the contiguous layout
    w._write("<i", t7.TYPE_TORCH)
    w._write("<i", 1)
    w._write_string("V 1")
    w._write_string("torch.FloatTensor")
    w._write("<i", 2)
    for s in (2, 3):
        w._write("<q", s)
    for s in (1, 2):  # strides: walk rows fastest
        w._write("<q", s)
    w._write("<q", 1)
    w._write("<i", t7.TYPE_TORCH)
    w._write("<i", 2)
    w._write_string("V 1")
    w._write_string("torch.FloatStorage")
    w._write("<q", 6)
    buf.write(np.arange(6, dtype=np.float32).tobytes())
    buf.seek(0)
    arr = t7.T7Reader(buf).read_object()
    np.testing.assert_array_equal(
        arr, np.arange(6, dtype=np.float32).reshape(3, 2).T
    )


def test_import_export_flat_cli(tmp_path):
    from novel_vqa_tpu.core.checkpoint import load_flat_h5, save_flat_h5
    from novel_vqa_tpu.train import import_t7

    vectors = {
        "encoder_w_q": np.random.RandomState(0).randn(40).astype(np.float32),
        "embedding_w_q": np.random.RandomState(1).randn(30).astype(np.float32),
        "multimodal_w": np.random.RandomState(2).randn(20).astype(np.float32),
    }
    t7_path = str(tmp_path / "lstm.t7")
    t7.save(t7_path, vectors)
    h5_path = str(tmp_path / "lstm.h5")
    import_t7.main(["import-flat", "--t7", t7_path, "--out", h5_path])
    loaded = load_flat_h5(h5_path)
    for k in vectors:
        np.testing.assert_array_equal(loaded[k], vectors[k])

    t7_out = str(tmp_path / "exported.t7")
    import_t7.main(["export-flat", "--h5", h5_path, "--out", t7_out])
    back = t7.load(t7_out)
    for k in vectors:
        np.testing.assert_array_equal(back[k], vectors[k])


def test_import_vision_traversal(tmp_path):
    """A synthetic nn.Sequential graph converts to our vision npz layout with
    the HWIO/linear transposes and the BGR swap."""
    from novel_vqa_tpu.train.import_t7 import vision_t7_to_npz

    rs = np.random.RandomState(0)
    conv1 = t7.TorchObject(
        "cudnn.SpatialConvolution",
        {"weight": rs.randn(4, 3, 3, 3).astype(np.float32), "bias": np.zeros(4, np.float32)},
    )
    relu = t7.TorchObject("cudnn.ReLU", {})
    fc = t7.TorchObject(
        "nn.Linear",
        {"weight": rs.randn(10, 4).astype(np.float32), "bias": np.ones(10, np.float32)},
    )
    net = t7.TorchObject("nn.Sequential", {"modules": [conv1, relu, fc]})

    out = str(tmp_path / "w.npz")
    vision_t7_to_npz(net, out, bgr_to_rgb=True, arch="vgg16")
    flat = dict(np.load(out))
    assert flat["conv/0/w"].shape == (3, 3, 3, 4)  # HWIO
    # BGR swap: input channel 0 of the converted net == torch channel 2
    np.testing.assert_allclose(
        flat["conv/0/w"][:, :, 0, :],
        np.transpose(np.asarray(conv1["weight"])[:, 2], (1, 2, 0)),
        rtol=1e-6,
    )
    assert flat["fc6/w"].shape == (4, 10)  # (in, out)
    np.testing.assert_array_equal(flat["fc6/b"], np.ones(10, np.float32))
