"""Torch-CPU reference baseline for the VQA train-step benchmark.

Faithful PyTorch-CPU re-enactment of the reference's arch1 training iteration
(002_train_vqa_arch1/002_train_baseline.lua:272-335): one-hot question
encoding times a Linear (the reference materializes the one-hot,
misc/RNNUtils.lua:42-53), a per-timestep 2-layer LSTM host loop over
length-sorted ragged batches (growing batch per step, RNNUtils.lua:128-154),
AxB fusion + classifier, CrossEntropy, full backward, and an rmsprop update —
all in float32 on CPU, which is what "Torch7 CPU throughput" means in
BASELINE.md's >=20x target.

Run as a module to print the measured QA-pairs/sec; bench.py uses the cached
number in bench_baseline.json (re-measure with --refresh).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(batch_size=500, iters=3, vocab=12782, seq=16, warmup=1, seed=0):
    import torch

    torch.manual_seed(seed)
    torch.set_num_threads(max(1, torch.get_num_threads()))

    E, H, layers, nhimage, common, nout = 200, 512, 2, 4096, 1024, 1000

    embedding = torch.nn.Sequential(
        torch.nn.Linear(vocab, E), torch.nn.Dropout(0.5), torch.nn.Tanh()
    )
    lstm_cells = torch.nn.ModuleList()
    for L in range(layers):
        in_size = E if L == 0 else H
        cell = torch.nn.Module()
        cell.i2h = torch.nn.Linear(in_size, 4 * H)
        cell.h2h = torch.nn.Linear(H, 4 * H)
        lstm_cells.append(cell)
    wq = torch.nn.Linear(2 * H * layers, common)
    wi = torch.nn.Linear(nhimage, common)
    classifier = torch.nn.Linear(common, nout)
    crit = torch.nn.CrossEntropyLoss()
    params = (
        list(embedding.parameters())
        + list(lstm_cells.parameters())
        + list(wq.parameters())
        + list(wi.parameters())
        + list(classifier.parameters())
    )
    opt = torch.optim.RMSprop(params, lr=3e-4, alpha=0.99, eps=1e-8)
    drop = torch.nn.Dropout(0.5)

    rs = np.random.RandomState(seed)

    def lstm_step(cell, x, c, h):
        gates = cell.i2h(x) + cell.h2h(h)
        i, f, o, g = gates.chunk(4, dim=1)
        c_new = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h_new = torch.sigmoid(o) * torch.tanh(c_new)
        return c_new, h_new

    def one_iter():
        # batch assembly mirrors dataset:next_batch (:195-222):
        lengths = np.sort(rs.randint(3, seq + 1, size=batch_size))[::-1].copy()
        tokens = [rs.randint(0, vocab, size=n) for n in lengths]
        fv_im = torch.from_numpy(rs.randn(batch_size, nhimage).astype(np.float32))
        labels = torch.from_numpy(rs.randint(0, nout, size=batch_size))

        # one-hot packing (sort_encoding_onehot_right_align)
        total = int(lengths.sum())
        onehot = torch.zeros(total, vocab)
        flat = np.concatenate(tokens)
        onehot[torch.arange(total), torch.from_numpy(flat)] = 1.0

        opt.zero_grad()
        emb = embedding(onehot)  # (total, E) — packed like the reference

        # ragged per-timestep loop: at step t, the n_t longest sequences are
        # active (right-aligned => batch grows over time)
        step_sizes = [(lengths >= (lengths[0] - t)).sum() for t in range(lengths[0])]
        c = [torch.zeros(0, H) for _ in range(layers)]
        h = [torch.zeros(0, H) for _ in range(layers)]
        off = 0
        # packed emb is per-sequence contiguous; rebuild per-step slices
        per_seq = emb.split([int(n) for n in lengths])
        step_inputs = []
        for t, n_t in enumerate(step_sizes):
            xs = torch.stack(
                [per_seq[b][t - (lengths[0] - lengths[b])] for b in range(int(n_t))]
            )
            step_inputs.append(xs)
        for t, xs in enumerate(step_inputs):
            n_t = xs.shape[0]
            for L in range(layers):
                if c[L].shape[0] < n_t:
                    pad = n_t - c[L].shape[0]
                    c[L] = torch.cat([c[L], torch.zeros(pad, H)])
                    h[L] = torch.cat([h[L], torch.zeros(pad, H)])
                inp = xs if L == 0 else drop(h[L - 1])
                c[L], h[L] = lstm_step(lstm_cells[L], inp, c[L], h[L])
        tv_q = torch.cat([torch.cat([c[L], h[L]], dim=1) for L in range(layers)], dim=1)
        fused = torch.tanh(wq(drop(tv_q))) * torch.tanh(wi(drop(fv_im)))
        scores = classifier(drop(fused))
        loss = crit(scores, labels)
        loss.backward()
        for p in params:
            if p.grad is not None:
                p.grad.clamp_(-10, 10)
        opt.step()
        return float(loss)

    for _ in range(warmup):
        one_iter()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def measure_text_ae(batch_size=1000, iters=1, vocab=20000, seq=16, warmup=1, seed=0):
    """Torch-CPU re-enactment of the text-AE training iteration
    (001_train_autoencoder/001_train_arch1_text_autoencoder.lua:208-249 with
    misc/AutoEncoder_text_nostart.lua): nostart encoder loop, teacher-forced
    decoder loop with the Linear(H, V+1) -> LogSoftMax head
    (misc/LSTM_decoder.lua:5-64), masked shifted-target NLL
    (LanguageModelCriterion, misc/AutoEncoder.lua:437-474), full backward,
    grad clamp 0.1 + weight decay, adam update."""
    import torch

    torch.manual_seed(seed)
    E = H = 512

    lookup = torch.nn.Embedding(vocab + 1, E)  # row 0 unused (1-indexed)
    drop = torch.nn.Dropout(0.5)
    enc = torch.nn.Module()
    enc.i2h = torch.nn.Linear(E, 4 * H)
    enc.h2h = torch.nn.Linear(H, 4 * H)
    dec = torch.nn.Module()
    dec.i2h = torch.nn.Linear(E, 4 * H)
    dec.h2h = torch.nn.Linear(H, 4 * H)
    proj = torch.nn.Linear(H, vocab + 1)
    params = (
        list(lookup.parameters()) + list(enc.parameters())
        + list(dec.parameters()) + list(proj.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-5, betas=(0.8, 0.999), eps=1e-8)

    rs = np.random.RandomState(seed)

    def cell(c, h, x, mod):
        gates = mod.i2h(x) + mod.h2h(h)
        i, f, o, g = gates.chunk(4, dim=1)
        c_new = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        return c_new, torch.sigmoid(o) * torch.tanh(c_new)

    def one_iter():
        lengths = rs.randint(3, seq + 1, size=batch_size)
        labels = np.zeros((seq, batch_size), np.int64)
        for b, ln in enumerate(lengths):
            labels[:ln, b] = rs.randint(1, vocab + 1, size=ln)
        lab = torch.from_numpy(labels)
        start = vocab + 1  # START == END == V+1 (1-indexed); row V in 0-index

        def embed(tok):  # lookup -> Dropout -> Tanh (nostart lookup pipeline)
            return torch.tanh(drop(lookup(torch.clamp(tok, 1, vocab + 1) - 1)))

        opt.zero_grad()
        c = h = torch.zeros(batch_size, H)
        for t in range(seq):  # encoder: tokens only, nulls redirected to 1
            c, h = cell(c, h, embed(torch.clamp(lab[t], min=1)), enc)
        # decoder: START then teacher-forced tokens; masked NLL on the fly
        dc, dh = c, h
        prev = torch.full((batch_size,), start, dtype=torch.long)
        loss = torch.zeros(())
        n_scored = 0
        for t in range(seq + 1):
            dc, dh = cell(dc, dh, embed(prev), dec)
            logp = torch.log_softmax(proj(drop(dh)), dim=1)
            if t < seq:
                target = lab[t]
            else:
                target = torch.zeros(batch_size, dtype=torch.long)
            # first null becomes END (= V+1); later nulls are unscored
            prev_tok = lab[t - 1] if t > 0 else torch.ones(batch_size, dtype=torch.long)
            scored = (target > 0) | ((target == 0) & (prev_tok > 0))
            tgt = torch.where(target > 0, target, torch.full_like(target, start))
            picked = logp[torch.arange(batch_size), tgt - 1]
            loss = loss - (picked * scored.float()).sum()
            n_scored += int(scored.sum())
            prev = torch.where(target > 0, target, torch.full_like(target, start))
        loss = loss / max(1, n_scored)
        loss.backward()
        for p in params:
            if p.grad is not None:
                p.grad.clamp_(-0.1, 0.1)
                p.grad.add_(p.data, alpha=1e-6)  # weight_decay 1e-6 (:237-243)
        opt.step()
        return float(loss)

    for _ in range(warmup):
        one_iter()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def build_torch_vgg(arch="vgg16", num_classes=1000, seed=0):
    """VGG in plain torch.nn (torchvision is not installed here) with the
    same topology as models/vision/vgg.py: 3x3 convs, 2x2 maxpools, fc6/7/8.
    Mirrors the loadcaffe graph of 001_prepro_img_vgg.lua:36."""
    import torch

    torch.manual_seed(seed)
    blocks = {"vgg16": [2, 2, 3, 3, 3], "vgg19": [2, 2, 4, 4, 4]}[arch]
    widths = [64, 128, 256, 512, 512]
    layers = []
    c_in = 3
    for width, n in zip(widths, blocks):
        for _ in range(n):
            layers += [torch.nn.Conv2d(c_in, width, 3, padding=1), torch.nn.ReLU()]
            c_in = width
        layers.append(torch.nn.MaxPool2d(2))
    features = torch.nn.Sequential(*layers)
    fc6 = torch.nn.Linear(7 * 7 * 512, 4096)
    fc7 = torch.nn.Linear(4096, 4096)
    fc8 = torch.nn.Linear(4096, num_classes)
    return features, fc6, fc7, fc8


def measure_fc7(batch_size=10, iters=2, warmup=1, seed=0):
    """Torch-CPU fc7 extraction rate (compute only, decode excluded — the
    same scope as the device-time images/sec/chip metric).  Reference
    workload: 001_prepro_img_vgg.lua:101-113 at batch 10."""
    import torch

    features, fc6, fc7, _ = build_torch_vgg(seed=seed)
    rs = np.random.RandomState(seed)
    x = torch.from_numpy(rs.randn(batch_size, 3, 224, 224).astype(np.float32))

    def one_batch():
        with torch.no_grad():
            f = features(x)
            f = torch.relu(fc6(f.reshape(batch_size, -1)))
            return torch.relu(fc7(f))

    for _ in range(warmup):
        one_batch()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_batch()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=500)
    ap.add_argument("--fc7_iters", type=int, default=2)
    ap.add_argument("--text_ae_iters", type=int, default=1)
    ap.add_argument("--skip_fc7", action="store_true")
    ap.add_argument("--skip_text_ae", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    qps = measure(batch_size=args.batch_size, iters=args.iters)
    result = {
        "torch_cpu_qa_pairs_per_sec": qps,
        "batch_size": args.batch_size,
        "iters": args.iters,
        "note": "PyTorch-CPU re-enactment of 002_train_baseline.lua iteration",
    }
    if not args.skip_fc7:
        result["torch_cpu_fc7_images_per_sec"] = measure_fc7(iters=args.fc7_iters)
        result["fc7_note"] = (
            "PyTorch-CPU VGG-16 fc7 forward, batch 10 "
            "(001_prepro_img_vgg.lua:101-113), compute only"
        )
    if not args.skip_text_ae:
        result["torch_cpu_text_ae_sentences_per_sec"] = measure_text_ae(
            iters=args.text_ae_iters
        )
        result["text_ae_note"] = (
            "PyTorch-CPU text-AE training iteration, batch 1000 "
            "(001_train_arch1_text_autoencoder.lua:208-249)"
        )
    print(json.dumps(result))
    if args.out:
        # merge-max policy: each torch_cpu_* throughput key keeps the
        # HIGHEST rate ever measured (host throughput varies ~30% run to
        # run on this shared 1-core box; best-torch makes every
        # vs_baseline speedup a conservative lower bound).  A re-measure
        # therefore never clobbers a better prior number, and keys/notes a
        # skipped run didn't produce survive.
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        # metadata travels WITH its rate: when a prior (better) rate is kept,
        # its companion params/notes must be kept too, or the file would
        # describe a different run than the one that produced the number
        companions = {
            "torch_cpu_qa_pairs_per_sec": ("batch_size", "iters", "note"),
            "torch_cpu_fc7_images_per_sec": ("fc7_note",),
            "torch_cpu_text_ae_sentences_per_sec": ("text_ae_note",),
        }
        skipped_companions = set()
        for k, v in result.items():
            if (
                k.startswith("torch_cpu_")
                and isinstance(merged.get(k), (int, float))
                and merged[k] >= v
            ):
                skipped_companions.update(companions.get(k, ()))
                continue  # keep the better prior measurement (+ its metadata)
            if k in skipped_companions:
                continue
            merged[k] = v
        merged.setdefault(
            "policy_note",
            "each key keeps the HIGHEST Torch-CPU rate measured across "
            "baseline runs (host throughput varies ~30% run to run on this "
            "shared 1-core box; taking the best torch number makes every "
            "vs_baseline speedup a conservative lower bound)",
        )
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
