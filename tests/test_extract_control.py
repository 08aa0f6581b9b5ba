"""The pipelined-extraction decode-free control (VERDICT round-4 item 6):
``run_pipelined_extraction(..., predecoded=...)`` must run the SAME loop fed
in-RAM batches and produce identical features to the pooled path — it is the
upload+dispatch+fetch-only ceiling bench.py reports next to the measured
sustained rate (workload 001_prepro_img_vgg.lua:101-113)."""

import os

import numpy as np
import pytest
from PIL import Image

from novel_vqa_tpu.data.images import DecodePool
from novel_vqa_tpu.train.extract_features import (
    build_model,
    run_pipelined_extraction,
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rs = np.random.RandomState(3)
    paths = []
    for i in range(7):  # deliberately not a batch multiple (final ragged batch)
        p = os.path.join(d, f"im{i}.jpg")
        Image.fromarray(rs.randint(0, 256, (40, 48, 3), dtype=np.uint8)).save(
            p, quality=92
        )
        paths.append(p)
    return paths


def test_predecoded_control_matches_pooled_loop(jpegs):
    model = build_model("vgg16", "", "fc7", seed=0, batch_size=1, image_size=32)
    _, size, crop, _ = model
    feats_pool, _ = run_pipelined_extraction([model], jpegs, 3, 2, depth=2)

    pool = DecodePool(size, crop, workers=2)
    try:
        triples = list(pool.iter_batches(jpegs, 3))
    finally:
        pool.close()
    feats_ctl, wall = run_pipelined_extraction(
        [model], jpegs, 3, 2, depth=2, predecoded=triples
    )
    np.testing.assert_array_equal(feats_pool, feats_ctl)
    assert wall > 0


def test_predecoded_rejects_multi_model(jpegs):
    model = build_model("vgg16", "", "fc7", seed=0, batch_size=1, image_size=32)
    with pytest.raises(ValueError, match="single model"):
        run_pipelined_extraction(
            [model, model], jpegs, 3, 2, predecoded=[]
        )
