"""HBM-resident AE scan training: iterator-semantics equivalence with the
CorpusLoader and CLI integration."""

import json
import os

import h5py
import numpy as np
import pytest

from novel_vqa_tpu.data.corpus import CorpusLoader


def scan_index_sequence(n_rows, batch_size, steps):
    """Replica of the scan body's index computation (train_text_ae)."""
    offset = 0
    out = []
    for _ in range(steps):
        base = offset if offset < n_rows - 1 else 0
        idx = base + np.arange(batch_size)
        idx = np.where(idx < n_rows, idx, idx - n_rows)
        out.append(idx)
        offset = 0 if offset + batch_size > n_rows else offset + batch_size
    return out


def test_scan_indices_match_corpus_loader(tmp_path):
    n, L, bs = 11, 3, 4
    labels = np.arange(1, n * L + 1, dtype=np.uint32).reshape(n, L)
    h5_path = str(tmp_path / "d.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("labels/train", dtype="uint32", data=labels)
        f.create_dataset("labels/val", dtype="uint32", data=labels[:2])
        f.create_dataset("labels/test", dtype="uint32", data=labels[:2])
    meta = str(tmp_path / "d.json")
    with open(meta, "w") as f:
        json.dump(
            {"ix_to_word": {"1": "a"}, "num_train": n, "num_val": 2, "num_test": 2},
            f,
        )
    loader = CorpusLoader(h5_path, meta)
    idx_seq = scan_index_sequence(n, bs, 9)
    for step, idx in enumerate(idx_seq):
        batch, _ = loader.get_batch("train", bs)  # (L, bs)
        np.testing.assert_array_equal(
            batch.T, labels[idx].astype(np.int32), err_msg=f"step {step}"
        )
    loader.close()


def test_ae_cli_steps_per_dispatch(tmp_path):
    from novel_vqa_tpu.train import train_text_ae

    rs = np.random.RandomState(0)
    V, L, n_train, n_val = 15, 4, 60, 10

    def split(n):
        lengths = rs.randint(1, L + 1, size=n)
        labels = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lengths):
            labels[i, :ln] = rs.randint(1, V + 1, size=ln)
        return labels

    h5_path = str(tmp_path / "data.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("labels/train", dtype="uint32", data=split(n_train))
        f.create_dataset("labels/val", dtype="uint32", data=split(n_val))
        f.create_dataset("labels/test", dtype="uint32", data=split(n_val))
    meta = str(tmp_path / "data.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "num_train": n_train, "num_val": n_val, "num_test": n_val,
            },
            f,
        )

    ckpt = str(tmp_path / "ae")
    os.makedirs(ckpt, exist_ok=True)
    train_text_ae.main(
        [
            "--input_h5", h5_path,
            "--input_json", meta,
            "--rnn_size", "10",
            "--input_encoding_size", "8",
            "--batch_size", "16",
            "--max_iters", "40",
            "--steps_per_dispatch", "10",
            "--save_checkpoint_every", "40",
            "--learning_rate", "1e-3",
            "--val_sentences_use", "10",
            "--losses_log_every", "10",
            "--language_eval", "1",
            "--checkpoint_path", ckpt,
        ]
    )
    assert os.path.exists(os.path.join(ckpt, "model_id.npz"))

def test_ae_cli_data_parallel(tmp_path):
    """text-AE --data_parallel wiring: per-step DP (host batch sharded over
    the mesh) and the DP scan, on the virtual 8-device mesh."""
    from novel_vqa_tpu.train import train_text_ae

    rs = np.random.RandomState(1)
    V, L, n_train, n_val = 12, 4, 50, 10

    def split(n):
        lengths = rs.randint(1, L + 1, size=n)
        labels = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lengths):
            labels[i, :ln] = rs.randint(1, V + 1, size=ln)
        return labels

    h5_path = str(tmp_path / "data.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("labels/train", dtype="uint32", data=split(n_train))
        f.create_dataset("labels/val", dtype="uint32", data=split(n_val))
        f.create_dataset("labels/test", dtype="uint32", data=split(n_val))
    meta = str(tmp_path / "data.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "num_train": n_train, "num_val": n_val, "num_test": n_val,
            },
            f,
        )
    common = [
        "--input_h5", h5_path,
        "--input_json", meta,
        "--rnn_size", "8",
        "--input_encoding_size", "8",
        "--batch_size", "16",
        "--save_checkpoint_every", "10",
        "--learning_rate", "1e-3",
        "--val_sentences_use", "10",
        "--losses_log_every", "5",
        "--data_parallel", "1",
    ]
    ck1 = str(tmp_path / "dp_step")
    os.makedirs(ck1, exist_ok=True)
    train_text_ae.main(common + ["--max_iters", "6", "--checkpoint_path", ck1])
    assert os.path.exists(os.path.join(ck1, "model_id.npz"))
    ck2 = str(tmp_path / "dp_scan")
    os.makedirs(ck2, exist_ok=True)
    train_text_ae.main(
        common + [
            "--max_iters", "10", "--steps_per_dispatch", "5",
            "--checkpoint_path", ck2,
        ]
    )
    assert os.path.exists(os.path.join(ck2, "model_id.npz"))
