"""Multi-step scan training driver: learns, and the CLI's
--steps_per_dispatch path produces checkpoints like the per-step path."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.models.vqa import arch1


def test_train_steps_scan_learns():
    cfg = arch1.Arch1Config(
        vocab_size=30, input_encoding_size=12, rnn_size=16, rnn_layer=1,
        nhimage=16, common_embedding_size=12, num_output=5,
    )
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tx = arch1.make_optimizer(learning_rate=3e-3)
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    n, n_img = 128, 10
    img_ans = rs.randint(1, 6, size=n_img)
    feats = (np.eye(5)[img_ans - 1] @ rs.randn(5, 16)).astype(np.float32)
    img_pos = rs.randint(1, n_img + 1, size=n)
    data = {
        "tokens": jnp.asarray(rs.randint(1, 30, size=(n, 5)), jnp.int32),
        "image": jnp.asarray(feats),
        "img_pos": jnp.asarray(img_pos, jnp.int32),
        "answers": jnp.asarray(img_ans[img_pos - 1], jnp.int32),
    }
    params, opt_state, losses = arch1.train_steps_scan(
        cfg, tx, params, opt_state, data, 120, 32, jax.random.PRNGKey(1)
    )
    L = np.asarray(losses)
    assert L.shape == (120,)
    assert np.isfinite(L).all()
    assert L[-20:].mean() < L[:20].mean() * 0.7, (L[:5], L[-5:])


def test_cli_steps_per_dispatch(tmp_path):
    import h5py
    import json

    from novel_vqa_tpu.train import train_vqa_arch1

    rs = np.random.RandomState(0)
    n, n_img, V, L, n_ans = 100, 8, 20, 5, 4
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = (np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)).astype(np.float32)

    def mk(nn):
        img_pos = rs.randint(1, n_img + 1, size=nn).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=nn).astype(np.uint32)
        q = np.zeros((nn, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(1, nn + 1, dtype=np.uint32), img_pos, img_ans[img_pos - 1].astype(np.uint32)

    tr, va = mk(n), mk(20)
    ques_h5 = str(tmp_path / "q.h5")
    with h5py.File(ques_h5, "w") as f:
        for name, s in (("train", tr), ("val", va)):
            f.create_dataset(f"ques_{name}", dtype="uint32", data=s[0])
            f.create_dataset(f"ques_length_{name}", dtype="uint32", data=s[1])
            f.create_dataset(f"question_id_{name}", dtype="uint32", data=s[2])
            f.create_dataset(f"img_pos_{name}", dtype="uint32", data=s[3])
        f.create_dataset("answers", dtype="uint32", data=tr[4])
        f.create_dataset("answers_val", dtype="uint32", data=va[4])
    img_h5 = str(tmp_path / "i.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_train", dtype="float32", data=feats)
        f.create_dataset("images_val", dtype="float32", data=feats)
    meta = str(tmp_path / "m.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "ix_to_ans": {str(i): f"a{i}" for i in range(1, n_ans + 1)},
                "unique_img_train": [], "unique_img_val": [], "unique_img_test": [],
            },
            f,
        )

    ckpt = str(tmp_path / "m") + "/"
    train_vqa_arch1.main(
        [
            "--input_img_h5", img_h5,
            "--input_ques_h5", ques_h5,
            "--input_json", meta,
            "--checkpoint_path", ckpt,
            "--batch_size", "25",
            "--max_iters", "40",
            "--save_checkpoint_every", "40",
            "--steps_per_dispatch", "10",
            "--nhimage", "8",
            "--input_encoding_size", "8",
            "--rnn_size", "12",
            "--rnn_layer", "1",
            "--common_embedding_size", "8",
            "--num_output", str(n_ans),
            "--log_every", "20",
        ]
    )
    assert os.path.exists(ckpt + "lstm.h5")
