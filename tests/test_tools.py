"""Tool CLIs: mean-vector producer, demo, arch2 scan driver."""

import json

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def test_compute_mean_vectors(tmp_path):
    from novel_vqa_tpu.core.checkpoint import save_npz
    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.train import compute_mean_vectors

    V, L, H, E = 15, 4, 8, 6
    cfg = ae.AEConfig(vocab_size=V, input_encoding_size=E, rnn_size=H, seq_length=L)
    params = jax.device_get(ae.init_params(jax.random.PRNGKey(0), cfg))
    ckpt = str(tmp_path / "ae.npz")
    save_npz(ckpt, params, meta={"cfg": cfg._asdict()})

    rs = np.random.RandomState(0)
    labels = np.zeros((20, L), np.uint32)
    for i in range(20):
        n = rs.randint(1, L + 1)
        labels[i, :n] = rs.randint(1, V + 1, size=n)
    h5_path = str(tmp_path / "data.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("labels/train", dtype="uint32", data=labels)
        f.create_dataset("labels/val", dtype="uint32", data=labels[:5])
        f.create_dataset("labels/test", dtype="uint32", data=labels[:5])
    meta = str(tmp_path / "data.json")
    with open(meta, "w") as f:
        json.dump(
            {"ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
             "num_train": 20, "num_val": 5, "num_test": 5},
            f,
        )

    out = str(tmp_path / "lstm_mean.h5")
    compute_mean_vectors.main(
        ["lstm", "--ae_model", ckpt, "--input_h5", h5_path, "--input_json", meta,
         "--batch_size", "8", "--out", out]
    )
    with h5py.File(out) as f:
        mv = f["mean_vector"][()]
    assert mv.shape == (1, 2 * H)

    # verify against a direct computation over the full split
    c, h = ae.encode(params, cfg, jnp.asarray(labels.astype(np.int32).T))
    expect = np.concatenate(
        [np.asarray(c[-1]), np.asarray(h[-1])], axis=1
    ).mean(axis=0)
    np.testing.assert_allclose(mv[0], expect, rtol=1e-4, atol=1e-5)

    img_h5 = str(tmp_path / "img.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_train", data=np.arange(12, dtype=np.float32).reshape(3, 4))
    out2 = str(tmp_path / "img_mean.h5")
    compute_mean_vectors.main(["image", "--input_img_h5", img_h5, "--out", out2])
    with h5py.File(out2) as f:
        np.testing.assert_allclose(f["mean_vector"][0], [4, 5, 6, 7])


def test_demo(tmp_path):
    from novel_vqa_tpu.eval import demo

    ann = {
        "info": {}, "data_type": "mscoco", "data_subtype": "val2014", "license": {},
        "annotations": [
            {"question_id": q, "image_id": 100 + q, "question_type": "what",
             "answer_type": "other",
             "answers": [{"answer": "cat", "answer_id": 1}]}
            for q in range(5)
        ],
    }
    ques = {
        "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
        "data_subtype": "val2014", "license": {},
        "questions": [
            {"question_id": q, "image_id": 100 + q, "question": f"q{q}?"}
            for q in range(5)
        ],
    }
    a = tmp_path / "a.json"
    b = tmp_path / "q.json"
    a.write_text(json.dumps(ann))
    b.write_text(json.dumps(ques))
    anns = demo.main(["--ann_file", str(a), "--ques_file", str(b), "--n", "2"])
    assert len(anns) == 2


def test_arch2_scan_driver():
    from novel_vqa_tpu.models.vqa import arch2

    cfg = arch2.Arch2Config(
        vocab_size=20, input_encoding_size=10, rnn_size=12, num_layers=1,
        nhimage=8, num_output=4, seq_length=5,
    )
    params = arch2.init_params(jax.random.PRNGKey(0), cfg)
    tx = arch2.make_optimizer(learning_rate=3e-3)
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    n, n_img = 64, 6
    img_ans = rs.randint(1, 5, size=n_img)
    feats = (np.eye(4)[img_ans - 1] @ rs.randn(4, 8)).astype(np.float32)
    img_pos = rs.randint(1, n_img + 1, size=n)
    data = {
        "tokens": jnp.asarray(rs.randint(1, 21, size=(n, 5)), jnp.int32),
        "image": jnp.asarray(feats),
        "img_pos": jnp.asarray(img_pos, jnp.int32),
        "answers": jnp.asarray(img_ans[img_pos - 1], jnp.int32),
    }
    params, opt_state, losses = arch2.train_steps_scan(
        cfg, tx, params, opt_state, data, 100, 32, jax.random.PRNGKey(1)
    )
    L = np.asarray(losses)
    assert np.isfinite(L).all()
    assert L[-15:].mean() < L[:15].mean(), (L[:5], L[-5:])
