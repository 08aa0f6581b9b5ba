"""Op-level device profile of a training workload.

Runs a workload under ``jax.profiler.trace`` and prints the top device ops
by total time, grouped per trace thread — the tool behind the PERF.md step
breakdowns (the reference has no profiler at all; its only timer is unused,
/root/reference/002_train_vqa_arch1/004_eval_model.lua:203).

Usage:
  python -m novel_vqa_tpu.utils.op_profile --workload arch1 \
      [--batch_size 500] [--scan_steps 25] [--chunks 2] [--top 40]

Workloads: ``arch1`` (the bench train scan), ``text_ae`` (AE pretraining
scan), ``inception`` / ``vgg16`` (extraction forward).
"""

from __future__ import annotations

import argparse
import sys
import tempfile

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr)


def build_arch1(batch_size: int, scan_steps: int):
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.models.vqa import arch1

    cfg = arch1.Arch1Config(vocab_size=12782)
    params = arch1.init_params(jax.random.PRNGKey(123), cfg)
    tx = arch1.make_optimizer()
    opt_state = tx.init(params)
    n_questions, n_images = 200_000, 20_000
    rs = np.random.RandomState(0)
    lengths = rs.randint(3, 17, size=n_questions)
    cols = np.arange(16)[None, :]
    tokens_h = np.where(
        cols >= (16 - lengths[:, None]),
        rs.randint(1, cfg.vocab_size, size=(n_questions, 16)),
        0,
    ).astype(np.int32)
    image_h = rs.randn(n_images, cfg.nhimage).astype(np.float32)
    image_h /= np.linalg.norm(image_h, axis=1, keepdims=True)
    data = {
        "tokens": jnp.asarray(tokens_h),
        "image": jnp.asarray(image_h),
        "img_pos": jnp.asarray(rs.randint(1, n_images + 1, size=n_questions), jnp.int32),
        "answers": jnp.asarray(rs.randint(1, 1001, size=n_questions), jnp.int32),
    }
    state = [params, opt_state]
    rngs = iter(np.arange(10_000))

    def step_fn():
        rng = jax.random.PRNGKey(next(rngs))
        state[0], state[1], losses = arch1.train_steps_scan(
            arch1.Arch1Config(vocab_size=12782), tx, state[0], state[1], data,
            scan_steps, batch_size, rng,
        )
        return losses

    return step_fn


def build_text_ae(batch_size: int, scan_steps: int):
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.train.train_text_ae import AETrainConfig, make_steps_scan, make_tx

    cfg = ae.AEConfig(
        vocab_size=20000, input_encoding_size=512, rnn_size=512, num_layers=1,
        seq_length=16, variant="text_nostart",
    )
    tx = make_tx(AETrainConfig())
    params = ae.init_params(jax.random.PRNGKey(123), cfg)
    rs = np.random.RandomState(0)
    lengths = rs.randint(3, 17, size=50_000)
    cols = np.arange(16)[None, :]
    rows = np.where(
        cols < lengths[:, None], rs.randint(1, 20001, size=(50_000, 16)), 0
    ).astype(np.int32)
    train_rows = jnp.asarray(rows)
    steps_fn = make_steps_scan(cfg, tx, scan_steps, batch_size)
    state = [params, tx.init(params), jnp.int32(0)]
    rngs = iter(np.arange(10_000))

    def step_fn():
        rng = jax.random.PRNGKey(next(rngs))
        state[0], state[1], state[2], losses = steps_fn(
            state[0], state[1], train_rows, state[2], rng
        )
        return losses

    return step_fn


def build_extraction(model: str, batch_size: int, compute_dtype: str):
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.train.extract_features import build_model

    forward, size, crop, _ = build_model(
        model, "", "fc7" if model.startswith("vgg") else "pool", 123,
        batch_size, compute_dtype=compute_dtype,
    )
    rs = np.random.RandomState(0)
    u8 = jnp.asarray(rs.randint(0, 256, size=(batch_size, size, size, 3), dtype=np.uint8))
    missing = jnp.zeros((batch_size,), bool)

    def step_fn():
        return forward(u8, missing)

    return step_fn


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload", default="arch1",
                    choices=["arch1", "text_ae", "vgg16", "inception"])
    ap.add_argument("--batch_size", type=int, default=0)
    ap.add_argument("--scan_steps", type=int, default=25)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--trace_dir", default="")
    args = ap.parse_args(argv)

    import jax

    from novel_vqa_tpu.core import device_bench as db

    if args.workload == "arch1":
        bs = args.batch_size or 500
        fn = build_arch1(bs, args.scan_steps)
        denom = args.chunks * args.scan_steps
    elif args.workload == "text_ae":
        bs = args.batch_size or 1000
        fn = build_text_ae(bs, args.scan_steps)
        denom = args.chunks * args.scan_steps
    else:
        bs = args.batch_size or 32
        fn = build_extraction(args.workload, bs, args.compute_dtype)
        denom = args.chunks

    _log("warmup (compile)…")
    out = fn()
    jax.device_get(out)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="nvqa_opprof_")
    _log(f"tracing {args.chunks} dispatches into {trace_dir} …")
    timing = db.measure_device_time(fn, args.chunks, trace_dir=trace_dir)

    mods = timing.summary.total()
    _log(f"module device time total: {mods.total_us/1e3:.2f} ms over {mods.count} executions")
    per_step_us = mods.total_us / max(1, denom)
    print(f"# per-step device time: {per_step_us:.1f} us  ({args.workload}, bs={bs})")

    ops = db.parse_trace_ops(trace_dir)
    for tname, table in sorted(ops.items()):
        total = sum(st.total_us for st in table.values())
        print(f"\n== thread: {tname}  ({len(table)} distinct ops, {total/1e3:.2f} ms total)")
        rows = sorted(table.values(), key=lambda s: -s.total_us)[: args.top]
        for st in rows:
            print(
                f"  {st.total_us/denom:10.1f} us/step  x{st.count:<6d} "
                f"{st.name[:110]}"
            )


if __name__ == "__main__":
    main()
