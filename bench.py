"""Benchmark driver: arch1 VQA training throughput (the north-star workload,
002_train_vqa_arch1/002_train_baseline.lua:394-414: batch 500, 2x512 LSTM,
fc7 late fusion, rmsprop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qa_pairs_per_sec", "vs_baseline": N}

``vs_baseline`` is the speedup over the Torch-CPU re-enactment of the same
iteration (novel_vqa_tpu/utils/torch_cpu_baseline.py), cached in
bench_baseline.json — BASELINE.md's throughput target is >=20x Torch7 CPU.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.models.vqa import arch1

    batch_size = int(os.environ.get("BENCH_BATCH", 500))
    seq = int(os.environ.get("BENCH_SEQ", 16))
    iters = int(os.environ.get("BENCH_ITERS", 200))
    warmup = int(os.environ.get("BENCH_WARMUP", 5))

    cfg = arch1.Arch1Config(vocab_size=12782)
    rng = jax.random.PRNGKey(123)
    params = arch1.init_params(rng, cfg)
    tx = arch1.make_optimizer()
    opt_state = tx.init(params)

    # HBM-resident dataset, device-side batch gather (train_step_indexed):
    # the reference gathers on host and re-ships ~8 MB of fc7 per iteration;
    # TPU-natively the whole split lives in HBM and only the (B,) sampled
    # index vector crosses the host boundary each step — sized like the
    # full novel-split train set (SURVEY.md section 6 scale anchors).
    n_questions = int(os.environ.get("BENCH_N_QUESTIONS", 200_000))
    n_images = int(os.environ.get("BENCH_N_IMAGES", 80_000))
    rs = np.random.RandomState(0)
    tokens_h = np.zeros((n_questions, seq), np.int32)
    lengths = rs.randint(3, seq + 1, size=n_questions)
    cols = np.arange(seq)[None, :]
    active = cols >= (seq - lengths[:, None])
    tokens_h = np.where(
        active, rs.randint(1, cfg.vocab_size, size=(n_questions, seq)), 0
    ).astype(np.int32)
    image_h = rs.randn(n_images, cfg.nhimage).astype(np.float32)
    image_h /= np.linalg.norm(image_h, axis=1, keepdims=True)
    data = {
        "tokens": jnp.asarray(tokens_h),
        "image": jnp.asarray(image_h),
        "img_pos": jnp.asarray(rs.randint(1, n_images + 1, size=n_questions), jnp.int32),
        "answers": jnp.asarray(
            rs.randint(1, cfg.num_output + 1, size=n_questions), jnp.int32
        ),
    }

    # steady-state path: lax.scan over steps with on-device batch sampling
    # (arch1.train_steps_scan) — zero per-step host work; chunk size bounds
    # the loss-history granularity
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", 25))
    step_rngs = jax.random.split(jax.random.PRNGKey(1), 1 + (warmup + iters))
    state = [params, opt_state]

    def run(n_chunks, offset):
        losses = None
        for i in range(n_chunks):
            state[0], state[1], losses = arch1.train_steps_scan(
                cfg, tx, state[0], state[1], data, scan_steps, batch_size,
                step_rngs[offset + i],
            )
        return losses

    warm_chunks = max(1, warmup // scan_steps)
    chunks = max(1, iters // scan_steps)
    losses = run(warm_chunks, 0)
    losses.block_until_ready()
    t0 = time.perf_counter()
    losses = run(chunks, warm_chunks)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    qps = batch_size * chunks * scan_steps / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["torch_cpu_qa_pairs_per_sec"]
        vs = qps / base

    print(
        json.dumps(
            {
                "metric": "vqa_arch1_train_throughput",
                "value": round(qps, 2),
                "unit": "qa_pairs_per_sec",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
