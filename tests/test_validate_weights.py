"""Dry-run of the one-command real-weight validation gate
(utils/validate_weights.py) on synthetic weights: record -> check must PASS,
a corrupted conv kernel must FAIL, discovery must map files to models — so
the command is known-good before real weights ever mount (VERDICT round-4
item 8; reference workloads 001_prepro_img_vgg.lua:36,
001_prepro_img_inc.lua:34)."""

import json
import os

import jax
import numpy as np
import pytest

from novel_vqa_tpu.core.checkpoint import load_npz, save_npz
from novel_vqa_tpu.models.vision import vgg
from novel_vqa_tpu.utils.validate_weights import discover_weights, run


@pytest.fixture(scope="module")
def synth_vgg16(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights")
    path = os.path.join(d, "vgg16_synth.npz")
    cfg = vgg.VGGConfig(arch="vgg16", image_size=64)
    params = jax.device_get(vgg.init_params(jax.random.PRNGKey(7), cfg))
    save_npz(path, params)
    return str(d), path


def test_record_then_check_roundtrip(tmp_path, synth_vgg16):
    d, _ = synth_vgg16
    fx = str(tmp_path / "fixtures.json")
    assert run(["--weights_dir", d, "--make_fixtures", fx,
                "--image_size", "64"]) == 0
    rec = json.load(open(fx))
    assert rec["schema"] == "novel-vqa-weight-fixtures-v1"
    assert set(rec["models"]["vgg16"]["taps"]) == {"fc7", "fc8"}
    assert rec["image_source"] == "synthetic-v1"
    # fc8 fixture carries per-image argmax "class" ids
    assert len(rec["models"]["vgg16"]["taps"]["fc8"]["argmax"]) == 4
    # same weights, same synthetic images -> PASS
    assert run(["--weights_dir", d, "--fixtures", fx,
                "--image_size", "64"]) == 0


def test_corrupted_weights_fail(tmp_path, synth_vgg16):
    _, wpath = synth_vgg16
    fx = str(tmp_path / "fixtures.json")
    assert run(["--weights", wpath, "--model", "vgg16",
                "--make_fixtures", fx, "--image_size", "64"]) == 0
    flat, _ = load_npz(wpath)
    bad = dict(flat)
    key = next(k for k in sorted(bad) if k.endswith("/w") and "conv" in k)
    bad[key] = np.asarray(bad[key]) + 0.05  # a wrong-topology-scale error
    bad_path = str(tmp_path / "vgg16_bad.npz")
    save_npz(bad_path, bad)
    assert run(["--weights", bad_path, "--model", "vgg16",
                "--fixtures", fx, "--image_size", "64"]) == 1


def test_discovery_maps_names_and_extensions(tmp_path):
    for name in ("vgg16.npz", "VGG19_layers.caffemodel", "inception_v3.t7",
                 "readme.txt", "vgg16_backup.caffemodel"):
        (tmp_path / name).write_bytes(b"x")
    found = discover_weights(str(tmp_path))
    assert found == {
        "vgg16": str(tmp_path / "vgg16.npz"),  # npz preferred over caffemodel
        "vgg19": str(tmp_path / "VGG19_layers.caffemodel"),
        "inception": str(tmp_path / "inception_v3.t7"),
    }


def test_discovery_matches_published_zoo_names(tmp_path):
    # the canonical Caffe zoo files have no literal "vgg16"/"vgg19"
    # substring (001_prepro_img_vgg.lua:36) — "vgg" + standalone depth
    # number must be enough, and "2016" must NOT read as a depth
    for name in ("VGG_ILSVRC_16_layers.caffemodel",
                 "VGG_ILSVRC_19_layers.caffemodel",
                 "vgg_release_2016.txt"):
        (tmp_path / name).write_bytes(b"x")
    found = discover_weights(str(tmp_path))
    assert found == {
        "vgg16": str(tmp_path / "VGG_ILSVRC_16_layers.caffemodel"),
        "vgg19": str(tmp_path / "VGG_ILSVRC_19_layers.caffemodel"),
    }


def test_check_mode_refuses_to_pass_on_zero_comparisons(tmp_path, synth_vgg16):
    # fixtures recorded for vgg16 only; weights dir holds only an
    # unrelated-to-fixtures model name -> nothing overlaps -> rc 2, not a
    # silent green PASS
    _, wpath = synth_vgg16
    fx = str(tmp_path / "fixtures.json")
    assert run(["--weights", wpath, "--model", "vgg16",
                "--make_fixtures", fx, "--image_size", "64"]) == 0
    other = tmp_path / "weights_other"
    other.mkdir()
    save_npz(str(other / "vgg19_synth.npz"),
             jax.device_get(vgg.init_params(
                 jax.random.PRNGKey(3),
                 vgg.VGGConfig(arch="vgg19", image_size=64))))
    assert run(["--weights_dir", str(other), "--fixtures", fx,
                "--image_size", "64"]) == 2


def test_check_mode_fails_cleanly_on_missing_tap_entry(tmp_path, synth_vgg16):
    # a fixture recorded before a tap rode along must FAIL with rc 1 (clean
    # message), not crash with a KeyError traceback
    _, wpath = synth_vgg16
    fx = str(tmp_path / "fixtures.json")
    assert run(["--weights", wpath, "--model", "vgg16",
                "--make_fixtures", fx, "--image_size", "64"]) == 0
    rec = json.load(open(fx))
    del rec["models"]["vgg16"]["taps"]["fc8"]
    json.dump(rec, open(fx, "w"))
    assert run(["--weights", wpath, "--model", "vgg16",
                "--fixtures", fx, "--image_size", "64"]) == 1


def test_check_mode_requires_matching_image_source(tmp_path, synth_vgg16):
    _, wpath = synth_vgg16
    fx = str(tmp_path / "fixtures.json")
    assert run(["--weights", wpath, "--model", "vgg16",
                "--make_fixtures", fx, "--image_size", "64"]) == 0
    rec = json.load(open(fx))
    rec["image_source"] = "files:deadbeef"
    json.dump(rec, open(fx, "w"))
    assert run(["--weights", wpath, "--model", "vgg16",
                "--fixtures", fx, "--image_size", "64"]) == 1
