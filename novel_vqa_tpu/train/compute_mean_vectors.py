"""Compute the mean LSTM sentence vector / mean image vector h5 inputs of the
weak-paired trainers.

The reference consumes ``-lstm_average_path`` / ``-img_average_path`` h5
files with a ``/mean_vector`` dataset
(004_train_arch1_weakpaired_autoencoder_vgg.lua:104-114) but ships no
producer; this tool closes the loop:

  lstm  — run a text-AE checkpoint's encoder over a corpus split and average
          the packed final [c, h] state -> (1, 2H) ``/mean_vector``;
  image — average rows of an ``images_train`` feature h5 (optionally
          L2-normalizing rows first, matching the trainer's own
          normalization of the mean image vector, :110-113).
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def run_lstm(args):
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core.checkpoint import load_npz
    from novel_vqa_tpu.data.corpus import CorpusLoader
    from novel_vqa_tpu.models.seq import autoencoder as ae

    flat, meta = load_npz(args.ae_model)
    if "lookup" not in flat and any(k.startswith("ae/") for k in flat):
        flat = {k[3:]: v for k, v in flat.items() if k.startswith("ae/")}
    loader = CorpusLoader(args.input_h5, args.input_json)
    cfg_meta = meta.get("cfg", {})
    cfg = ae.AEConfig(
        vocab_size=loader.vocab_size,
        input_encoding_size=cfg_meta.get("input_encoding_size", args.input_encoding_size),
        rnn_size=cfg_meta.get("rnn_size", args.rnn_size),
        num_layers=cfg_meta.get("num_layers", 1),
        seq_length=loader.seq_length,
        variant=cfg_meta.get("variant", "text_nostart"),
    )
    n_enc = len({k.split("/")[1] for k in flat if k.startswith("encoder/")})
    params = {
        "lookup": jnp.asarray(flat["lookup"]),
        "encoder": [
            {p: jnp.asarray(flat[f"encoder/{i}/{p}"]) for p in ("wx", "bx", "wh", "bh")}
            for i in range(n_enc)
        ],
    }

    @jax.jit
    def encode_batch(seq):
        c, h = ae.encode(params, cfg, seq, deterministic=True)
        return jnp.concatenate([c[-1], h[-1]], axis=-1)  # [c, h] layout

    total = np.zeros((2 * cfg.rnn_size,), np.float64)
    count = 0
    n_split = loader.split_count[args.split]
    loader.reset_iterator(args.split)
    while True:
        labels, bounds = loader.get_batch(args.split, args.batch_size)
        vecs = np.asarray(encode_batch(jnp.asarray(labels)))
        if bounds["wrapped"]:
            # the wrap-around batch re-reads head sentences; average each
            # sentence exactly once
            vecs = vecs[: n_split - count]
        total += vecs.sum(axis=0)
        count += vecs.shape[0]
        if bounds["wrapped"] or (0 < args.max_sentences <= count):
            break
    mean = (total / count).astype(np.float32)[None, :]
    with h5py.File(args.out, "w") as f:
        f.create_dataset("mean_vector", dtype="float32", data=mean)
    print(f"wrote {args.out} from {count} sentences, shape {mean.shape}")
    loader.close()


def run_image(args):
    with h5py.File(args.input_img_h5, "r") as f:
        feats = f[args.dataset][()]
    if args.l2_normalize:
        feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    mean = feats.mean(axis=0, dtype=np.float64).astype(np.float32)[None, :]
    with h5py.File(args.out, "w") as f:
        f.create_dataset("mean_vector", dtype="float32", data=mean)
    print(f"wrote {args.out}, shape {mean.shape}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("lstm")
    p.add_argument("--ae_model", required=True)
    p.add_argument("--input_h5", required=True)
    p.add_argument("--input_json", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--max_sentences", default=-1, type=int)
    p.add_argument("--rnn_size", default=512, type=int)
    p.add_argument("--input_encoding_size", default=512, type=int)
    p.add_argument("--out", default="lstm_mean.h5")

    p = sub.add_parser("image")
    p.add_argument("--input_img_h5", required=True)
    p.add_argument("--dataset", default="images_train")
    p.add_argument("--l2_normalize", default=0, type=int)
    p.add_argument("--out", default="img_mean.h5")

    args = ap.parse_args(argv)
    if args.cmd == "lstm":
        run_lstm(args)
    else:
        run_image(args)


if __name__ == "__main__":
    main()
