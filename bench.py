"""Benchmark driver: the two BASELINE.md throughput workloads, measured from
profiler *device time* (not tunnel wall-clock — see CLAUDE.md and
novel_vqa_tpu/core/device_bench.py).

  * primary  — arch1 VQA training throughput (QA-pairs/sec/chip), workload
    /root/reference/002_train_vqa_arch1/002_train_baseline.lua:394-414
    (batch 500, 2x512 LSTM, fc7 late fusion, rmsprop);
  * secondary — VGG-16 fc7 extraction (images/sec/chip), workload
    /root/reference/002_train_vqa_arch1/001_prepro_img_vgg.lua:101-113,
    including the host decode-pool rate AND a *measured* sustained rate from
    the real pipelined extraction loop (not just the min(stages) model);
  * secondary — Inception-v3 pool-tap extraction (images/sec/chip) at the
    recommended bs-128 bf16 branch-fused config, workload
    /root/reference/002_train_vqa_arch1/001_prepro_img_inc.lua:34-57
    (BENCH_SKIP_INC=1 to skip, BENCH_INC_BATCH/_DTYPE for the sweep);
  * secondary — text-AE pretraining (sentences/sec/chip), workload
    /root/reference/001_train_autoencoder/001_train_arch1_text_autoencoder.lua:148-249,
    with a val-loss sanity figure;
  * secondary — weak-paired joint CNN+AE training (images/sec, finetune
    phase: VGG-16 fwd+bwd + both optimizers in one step), workload
    /root/reference/001_train_autoencoder/004_train_arch1_weakpaired_autoencoder_vgg.lua:317,477-487.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qa_pairs_per_sec", "vs_baseline": N,
   "device_step_ms": ..., "mfu": ..., "timing_source": ..., "secondary": [...]}

``value`` is derived from trace device time and carries an MFU <= 1 sanity
bound; wall-clock figures are reported alongside but flagged untrusted when
they imply >100% MFU.  ``vs_baseline`` is the speedup over the Torch-CPU
re-enactment (novel_vqa_tpu/utils/torch_cpu_baseline.py, bench_baseline.json)
— BASELINE.md's target is >=20x Torch CPU.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr)


# Shared progress state for the watchdog (see _start_watchdog): main()
# records completed workload results here so a deadline fire can still emit
# them, and sets "done" once the final record has been printed.
_progress = {"train": None, "secondary": [], "stage": "init", "done": False}
_emit_lock = threading.Lock()


def _claim_emit() -> bool:
    """Exactly-one-emitter guard for the final JSON record.  The watchdog's
    deadline fire races main()'s own completion near the deadline; without
    the claim both could print a JSON line (and os._exit(3) could truncate
    the real one mid-write).  The single caller that flips ``done`` under
    the lock gets to emit; everyone else stands down."""
    with _emit_lock:
        if _progress["done"]:
            return False
        _progress["done"] = True
        return True


def _emit_final(train, secondary, base, extra=None):
    """Assemble and print THE one-line JSON record (also used by the
    watchdog to flush partial results on a deadline fire)."""
    vs = None
    if train and train.get("items_per_sec") and base.get("torch_cpu_qa_pairs_per_sec"):
        vs = train["items_per_sec"] / base["torch_cpu_qa_pairs_per_sec"]
    out = {
        "metric": "vqa_arch1_train_throughput",
        "value": train.get("items_per_sec") if train else None,
        "unit": "qa_pairs_per_sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    for k in (
        "timing_source",
        "device_step_ms",
        "mfu",
        "flops_per_step",
        "batch_size",
        "wall_items_per_sec",
        "wall_mfu",
        "wall_clock_trusted",
        "compute_dtype",
    ):
        if train and k in train:
            out[k] = train[k]
    if secondary:
        out["secondary"] = secondary
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def _load_baseline():
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            return json.load(f)
    return {}


def _start_watchdog():
    """Deadline guard against the tunnel dying MID-run (VERDICT round-4
    weak item 2's other half): a hung jax call can't be bounded in-process,
    so a daemon thread fires after BENCH_DEADLINE seconds (default 1380;
    0 disables) and, if the final record hasn't
    been printed yet, emits whatever results completed so far as the
    one-line JSON (with an ``error`` field naming the stage that hung) and
    hard-exits.  The driver then records a parseable partial instead of
    rc=124/parsed:null.

    Default calibration: the only hard evidence on the external kill window
    is round 4's BENCH_r04.json tail — the probe message at t=1440 s printed,
    the t=1860 s one did not, so the kill landed somewhere in [1440, 1860].
    The deadline must sit BELOW the window's lower bound to guarantee the
    partial record lands for any kill budget in that range: 1380 = 1440 − 60 s
    margin.  The failure modes are asymmetric — a too-low deadline truncates
    a slow-but-healthy run to a parseable partial (completed rows + an
    ``error`` field), a too-high one reproduces rc=124/parsed:null — so when
    in doubt, lower.  A warm full default set finishes in well under 1380 s;
    a COLD one may not (see the compile-cache default in main())."""
    deadline = float(os.environ.get("BENCH_DEADLINE", 1380))
    if deadline <= 0:
        return None

    def fire():
        if not _claim_emit():
            return
        _emit_final(
            _progress["train"],
            _progress["secondary"],
            _load_baseline(),
            extra={
                "error": (
                    f"bench watchdog: deadline {deadline:.0f}s expired during "
                    f"stage {_progress['stage']!r} — a hung backend OR a run "
                    "legitimately slower than the deadline (cold tunnel "
                    "compiles can dominate a FIRST run; the default compile "
                    "cache only warms repeats); record carries the workloads "
                    "that completed"
                ),
                "deadline_s": deadline,
            },
        )
        os._exit(3)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def wait_for_backend():
    """Bounded guard against a hung device backend (the axon TPU tunnel
    occasionally goes fully unresponsive: any process touching it blocks
    forever in backend init, so a bench launched during an outage would
    hang silently instead of recording anything).  Probes ``jax.devices()``
    in a SUBPROCESS with a timeout (the only way to bound a hung backend
    init) and retries for up to BENCH_TUNNEL_WAIT seconds (default 600 —
    kept WELL under the driver's observed ~1800 s kill window so the
    give-up record always lands on stdout before an external kill; the
    round-4 default of 3600 out-waited the driver and produced
    parsed:null); on a healthy backend (TPU up, or JAX_PLATFORMS=cpu) the
    first probe returns in seconds.  Gives up with a LOUD one-line JSON
    error on stdout and a nonzero exit, never a hang."""
    import subprocess

    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", 180))
    budget = float(os.environ.get("BENCH_TUNNEL_WAIT", 600))
    deadline = time.monotonic() + budget
    attempt = 0
    fast_failures = 0  # consecutive instant nonzero exits = broken env
    while True:
        attempt += 1
        t0 = time.monotonic()
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            # A tunnel outage HANGS the probe (TimeoutExpired); an instant
            # nonzero exit means the probe subprocess itself is broken
            # (unimportable jax, bad venv) and can never recover — fail
            # fast instead of burning the whole outage budget on it.
            if (isinstance(e, subprocess.CalledProcessError)
                    and time.monotonic() - t0 < 10):
                fast_failures += 1
            else:
                fast_failures = 0
            remaining = deadline - time.monotonic()
            if remaining <= 0 or fast_failures >= 3:
                why = ("probe subprocess exits nonzero instantly "
                       "(broken environment, not a tunnel outage)"
                       if fast_failures >= 3 else
                       f"jax.devices() probe failed {attempt}x "
                       f"over {budget:.0f}s")
                if not _claim_emit():  # watchdog already emitted
                    raise SystemExit(1)
                print(json.dumps({
                    # same metric name as the success record so drivers that
                    # key on the primary metric associate the outage with it
                    "metric": "vqa_arch1_train_throughput",
                    "value": None,
                    "unit": "qa_pairs_per_sec",
                    "vs_baseline": None,
                    "error": f"device backend unreachable: {why} ({e!r})",
                }))
                raise SystemExit(1)
            _log(f"backend probe {attempt} failed ({e!r}); "
                 f"retrying for another {remaining:.0f}s")
            time.sleep(min(240, max(1, remaining)))


def _flops_per_step(tag, analytic, lower_fn):
    """Resolve the per-step FLOP count: ``Compiled.cost_analysis()`` when it
    is in sane agreement (0.5-3.0x) with the analytic matmul count, else the
    analytic count — guards against cost-model artifacts and the
    scan-body-counted-once undercount (CLAUDE.md trace caveats).
    ``lower_fn`` returns a Lowered for ONE step."""
    cost_flops = None
    try:
        cost = lower_fn().compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        cost_flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # diagnostics only
        _log(f"{tag}: cost_analysis unavailable:", repr(e))
    _log(
        f"{tag}: flops/step cost={cost_flops and f'{cost_flops:.3e}'} "
        f"analytic={analytic:.3e}"
    )
    if cost_flops and 0.5 < cost_flops / analytic < 3.0:
        return cost_flops
    return analytic


def bench_train():
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.models.vqa import arch1

    batch_size = int(os.environ.get("BENCH_BATCH", 500))
    seq = int(os.environ.get("BENCH_SEQ", 16))
    # trace collection through the tunnel costs ~2 min regardless of size;
    # 4 traced chunks (100 steps) give stable device-time statistics
    iters = int(os.environ.get("BENCH_ITERS", 100))
    warmup = int(os.environ.get("BENCH_WARMUP", 25))

    compute_dtype = os.environ.get("BENCH_DTYPE", "float32")
    if compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"BENCH_DTYPE={compute_dtype!r}: must be 'float32' or 'bfloat16' "
            "(a typo would silently benchmark f32)"
        )
    cfg = arch1.Arch1Config(vocab_size=12782, compute_dtype=compute_dtype)
    rng = jax.random.PRNGKey(123)
    params = arch1.init_params(rng, cfg)
    tx = arch1.make_optimizer()
    opt_state = tx.init(params)

    # HBM-resident dataset, on-device batch sampling (train_steps_scan): the
    # reference gathers on host and re-ships ~8 MB of fc7 per iteration;
    # TPU-natively the whole split lives in HBM — sized like the full
    # novel-split train set (SURVEY.md section 6 scale anchors).
    n_questions = int(os.environ.get("BENCH_N_QUESTIONS", 200_000))
    # 20k fc7 rows (~330 MB) keeps the one-time host->HBM upload through the
    # tunnel reasonable while still far exceeding any batch working set
    n_images = int(os.environ.get("BENCH_N_IMAGES", 20_000))
    rs = np.random.RandomState(0)
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

    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", 25))
    chunks = max(1, iters // scan_steps)
    warm_chunks = max(1, warmup // scan_steps)
    # keys for warmup + an UNTRACED wall window + the traced device window
    step_rngs = jax.random.split(jax.random.PRNGKey(1), warm_chunks + 2 * chunks)
    state = [params, opt_state]

    # exact FLOPs per step from a compiled SINGLE step, with the analytic
    # matmul count as a cross-check (VERDICT round-1 item 1a); the scan
    # chunk itself must not be the FLOPs source (body counted once).
    flops_per_step = _flops_per_step(
        "train",
        db.analytic_flops_arch1_step(cfg, batch_size, seq),
        lambda: arch1.train_step_indexed.lower(
            cfg, tx, state[0], state[1], data,
            jnp.zeros((batch_size,), jnp.int32), step_rngs[0],
        ),
    )

    it = iter(range(warm_chunks + 2 * chunks))

    def chunk():
        i = next(it)
        state[0], state[1], losses = arch1.train_steps_scan(
            cfg, tx, state[0], state[1], data, scan_steps, batch_size, step_rngs[i]
        )
        return losses

    for _ in range(warm_chunks):
        out = chunk()
    jax.device_get(out)  # force warmup completion before the timed windows

    # UNTRACED wall window first: chunks dispatch asynchronously and chain
    # on the carried state, so one device_get at the end forces them all.
    # Measuring wall under the active profiler (round 3) buried the real
    # wall rate under trace overhead — an 18x artifact (VERDICT round-3
    # weak item 2); untraced, wall items/sec lands within ~4% of the
    # device figure at the default 25-step chunks (see wall_sweep).
    t0 = time.perf_counter()
    for _ in range(chunks):
        out = chunk()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(chunk, chunks)
    dev_s, n_mod = timing.module_seconds("jit_train_steps_scan")
    if dev_s is not None and n_mod != chunks:
        _log(f"train: WARNING trace captured {n_mod}/{chunks} chunk executions")
        dev_s = dev_s * chunks / n_mod  # scale to the dispatched count
    rec = db.summarize(
        flops_per_step=flops_per_step,
        device_s=dev_s,
        n_steps=chunks * scan_steps,
        items_per_step=batch_size,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec["batch_size"] = batch_size
    rec["compute_dtype"] = compute_dtype

    # wall-vs-device convergence (BENCH_WALL_SWEEP=1, VERDICT round-3 item
    # 3): wall items/sec at increasing steps_per_dispatch.  Completion is
    # forced by device_get(losses) — losses depend on every step, so the
    # elapsed wall is a true lower bound on throughput even through the
    # tunnel (unlike block_until_ready).
    if os.environ.get("BENCH_WALL_SWEEP", "0") == "1":
        sweep = {}
        key = jax.random.PRNGKey(2)
        for sw_steps in (25, 250, 2500):
            sw_chunks = max(2, int(os.environ.get("BENCH_SWEEP_STEPS", 5000)) // sw_steps)
            keys = jax.random.split(jax.random.fold_in(key, sw_steps), sw_chunks + 1)
            state[0], state[1], losses = arch1.train_steps_scan(
                cfg, tx, state[0], state[1], data, sw_steps, batch_size, keys[-1]
            )
            jax.device_get(losses)  # compile + warm outside the timed window
            t0 = time.perf_counter()
            for i in range(sw_chunks):
                state[0], state[1], losses = arch1.train_steps_scan(
                    cfg, tx, state[0], state[1], data, sw_steps, batch_size, keys[i]
                )
            jax.device_get(losses)  # chunks chain sequentially => forces all
            wall = time.perf_counter() - t0
            n_st = sw_chunks * sw_steps
            sweep[str(sw_steps)] = {
                "wall_ms_per_step": round(1000 * wall / n_st, 4),
                "wall_items_per_sec": round(n_st * batch_size / wall, 1),
                "chunks": sw_chunks,
            }
            _log(f"wall_sweep steps_per_dispatch={sw_steps}: {sweep[str(sw_steps)]}")
        rec["wall_sweep"] = sweep
    return rec


def bench_arch2():
    """Arch2 (encoder-init) VQA training throughput — workload
    /root/reference/003_train_vqa_arch2/002_train_baseline.lua (bs 500,
    1x512 encoder over [img, START, tokens], rmsprop + wd).  Opt-in
    secondary (BENCH_ARCH2=1): same shape of measurement as bench_train."""
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.models.vqa import arch2

    batch_size = int(os.environ.get("BENCH_BATCH", 500))
    seq = int(os.environ.get("BENCH_SEQ", 16))
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", 25))
    chunks = int(os.environ.get("BENCH_ARCH2_CHUNKS", 4))

    cfg = arch2.Arch2Config(vocab_size=12782)
    params = arch2.init_params(jax.random.PRNGKey(123), cfg)
    tx = arch2.make_optimizer()
    opt_state = tx.init(params)

    n_questions = int(os.environ.get("BENCH_N_QUESTIONS", 200_000))
    n_images = int(os.environ.get("BENCH_N_IMAGES", 20_000))
    rs = np.random.RandomState(0)
    lengths = rs.randint(3, seq + 1, size=n_questions)
    cols = np.arange(seq)[None, :]
    # arch2 tokens are LEFT-aligned (pad suffix)
    tokens_h = np.where(
        cols < lengths[:, None], rs.randint(1, cfg.vocab_size, size=(n_questions, seq)), 0
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

    flops_per_step = _flops_per_step(
        "arch2",
        db.analytic_flops_arch2_step(cfg, batch_size, seq),
        lambda: arch2.train_step_indexed.lower(
            cfg, tx, params, opt_state, data,
            jnp.zeros((batch_size,), jnp.int32), jax.random.PRNGKey(0),
        ),
    )

    warm_chunks = 1
    step_rngs = jax.random.split(jax.random.PRNGKey(1), warm_chunks + 2 * chunks)
    state = [params, opt_state]
    it = iter(range(warm_chunks + 2 * chunks))

    def chunk():
        i = next(it)
        state[0], state[1], losses = arch2.train_steps_scan(
            cfg, tx, state[0], state[1], data, scan_steps, batch_size, step_rngs[i]
        )
        return losses

    for _ in range(warm_chunks):
        out = chunk()
    jax.device_get(out)

    # untraced wall window (see bench_train: wall under the profiler is an
    # artifact; untraced async dispatch tracks device time)
    t0 = time.perf_counter()
    for _ in range(chunks):
        out = chunk()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(chunk, chunks)
    dev_s, n_mod = timing.module_seconds("jit_train_steps_scan")
    if dev_s is not None and n_mod != chunks:
        _log(f"arch2: WARNING trace captured {n_mod}/{chunks} chunk executions")
        dev_s = dev_s * chunks / n_mod
    rec = db.summarize(
        flops_per_step=flops_per_step,
        device_s=dev_s,
        n_steps=chunks * scan_steps,
        items_per_step=batch_size,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec.update(
        {
            "metric": "vqa_arch2_train_throughput",
            "unit": "qa_pairs_per_sec",
            "value": rec.get("items_per_sec"),
            "batch_size": batch_size,
        }
    )
    return rec


def bench_text_ae():
    """Text-AE pretraining throughput (sentences/sec/chip) — BASELINE.md's
    text-AE metric row, workload
    /root/reference/001_train_autoencoder/001_train_arch1_text_autoencoder.lua:148-249
    (arch1 nostart AE, bs 1000, 1x512, seq 16, V ~20k, adam)."""
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.train.train_text_ae import (
        AETrainConfig,
        make_steps_scan,
        make_tx,
    )

    batch_size = int(os.environ.get("BENCH_AE_BATCH", 1000))
    seq = int(os.environ.get("BENCH_AE_SEQ", 16))
    vocab = int(os.environ.get("BENCH_AE_VOCAB", 20000))
    scan_steps = int(os.environ.get("BENCH_AE_SCAN_STEPS", 25))
    chunks = int(os.environ.get("BENCH_AE_CHUNKS", 4))
    ae_dtype = os.environ.get("BENCH_AE_DTYPE", "float32")
    if ae_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"BENCH_AE_DTYPE={ae_dtype!r}: must be 'float32' or 'bfloat16'"
        )

    cfg = ae.AEConfig(
        vocab_size=vocab, input_encoding_size=512, rnn_size=512, num_layers=1,
        seq_length=seq, variant="text_nostart", compute_dtype=ae_dtype,
    )
    tx = make_tx(AETrainConfig())  # reference optimizer defaults (adam 1e-5)
    params = ae.init_params(jax.random.PRNGKey(123), cfg)
    opt_state = tx.init(params)

    n_rows = int(os.environ.get("BENCH_AE_ROWS", 50_000))
    rs = np.random.RandomState(0)
    lengths = rs.randint(3, seq + 1, size=n_rows)
    cols = np.arange(seq)[None, :]
    rows = np.where(
        cols < lengths[:, None], rs.randint(1, vocab + 1, size=(n_rows, seq)), 0
    ).astype(np.int32)
    train_rows = jnp.asarray(rows)

    # a 1-step scan: cost_analysis counts the while body once, which for
    # n_steps=1 IS the per-step figure
    flops_per_step = _flops_per_step(
        "text_ae",
        db.analytic_flops_text_ae_step(cfg, batch_size, seq),
        lambda: make_steps_scan(cfg, tx, 1, batch_size, donate=False).lower(
            params, opt_state, train_rows, jnp.int32(0), jax.random.PRNGKey(0)
        ),
    )

    steps_fn = make_steps_scan(cfg, tx, scan_steps, batch_size)
    warm_chunks = 1
    step_rngs = jax.random.split(jax.random.PRNGKey(1), warm_chunks + 2 * chunks)
    state = [params, opt_state, jnp.int32(0)]
    it = iter(range(warm_chunks + 2 * chunks))

    def chunk():
        i = next(it)
        state[0], state[1], state[2], losses = steps_fn(
            state[0], state[1], train_rows, state[2], step_rngs[i]
        )
        return losses

    for _ in range(warm_chunks):
        out = chunk()
    jax.device_get(out)  # force warmup completion before the timed windows

    # untraced wall window (see bench_train)
    t0 = time.perf_counter()
    for _ in range(chunks):
        out = chunk()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(chunk, chunks)
    dev_s, n_mod = timing.module_seconds("jit_steps")
    if dev_s is not None and n_mod != chunks:
        _log(f"text_ae: WARNING trace captured {n_mod}/{chunks} chunk executions")
        dev_s = dev_s * chunks / n_mod
    rec = db.summarize(
        flops_per_step=flops_per_step,
        device_s=dev_s,
        n_steps=chunks * scan_steps,
        items_per_step=batch_size,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    # val-loss sanity: deterministic NLL on a held-out batch must be finite
    # and near log(V+1) this early in training (random init, tiny lr)
    val_seq = jnp.asarray(rows[:batch_size].T)
    val_loss = float(
        ae.apply_nll(state[0], cfg, val_seq, deterministic=True)[0]
    )
    rec.update(
        {
            "metric": "text_ae_train_throughput",
            "unit": "sentences_per_sec",
            "value": rec.get("items_per_sec"),
            "batch_size": batch_size,
            "compute_dtype": ae_dtype,
            "nll_unroll": os.environ.get("NOVEL_VQA_AE_NLL_UNROLL", "0") == "1",
            "val_loss": round(val_loss, 4),
            "val_loss_sane": bool(
                np.isfinite(val_loss) and val_loss < 2.0 * np.log(vocab + 1)
            ),
        }
    )
    return rec


def bench_weakpaired():
    """Weak-paired joint CNN+AE training (the heaviest compute in the
    pipeline: VGG-16 fwd+bwd inside the loop), workload
    /root/reference/001_train_autoencoder/004_train_arch1_weakpaired_autoencoder_vgg.lua:317,477-487
    — finetune phase (gradients through the CNN into its own optimizer),
    non-skip batches, reference batch size."""
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.train.train_weakpaired_ae import (
        WPTrainConfig,
        build_cnn,
        make_ae_tx,
        make_cnn_tx,
        make_train_step,
    )

    batch = int(os.environ.get("BENCH_WP_BATCH", 16))
    steps = int(os.environ.get("BENCH_WP_STEPS", 12))
    vocab = int(os.environ.get("BENCH_WP_VOCAB", 20000))
    seq_len = 16

    opt = WPTrainConfig(
        batch_size=batch,
        compute_dtype=os.environ.get("BENCH_WP_DTYPE", "float32"),
    )
    cfg = ae.AEConfig(
        vocab_size=vocab, input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size, num_layers=opt.num_layers, seq_length=seq_len,
        dropout=opt.drop_prob_ae, variant="vqa_arch", nhimage=opt.nhimage,
    )
    rng0 = jax.random.PRNGKey(123)
    ae_params = ae.init_params(rng0, cfg)
    # vqa_arch uses build_cnn_2 (no projection, net_utils.lua:46-81)
    cnn_params, cnn_apply, _ = build_cnn(opt, False, jax.random.fold_in(rng0, 7))
    ae_tx, cnn_tx = make_ae_tx(opt), make_cnn_tx(opt)
    ae_opt_state = ae_tx.init(ae_params)
    cnn_opt_state = cnn_tx.init(cnn_params)
    step_fn = make_train_step(
        cfg, "vqa_arch", opt.crop_size, cnn_apply, ae_tx, cnn_tx,
        remat=os.environ.get("BENCH_WP_REMAT", "0") == "1",
    )

    rs = np.random.RandomState(0)
    images_u8 = jnp.asarray(
        rs.randint(0, 256, size=(batch, opt.image_size, opt.image_size, 3), dtype=np.uint8)
    )
    offsets = jnp.asarray(
        rs.randint(0, opt.image_size - opt.crop_size + 1, size=(batch, 2)), jnp.int32
    )
    lengths = rs.randint(3, seq_len + 1, size=batch)
    rows = np.where(
        np.arange(seq_len)[:, None] < lengths[None, :],
        rs.randint(1, vocab + 1, size=(seq_len, batch)), 0,
    ).astype(np.int32)
    seq = jnp.asarray(rows)  # time-major (L, N)
    sent_input = jnp.zeros((batch, 2 * cfg.rnn_size), jnp.float32)
    step_rngs = jax.random.split(jax.random.PRNGKey(1), 2 * steps + 1)
    state = [ae_params, ae_opt_state, cnn_params, cnn_opt_state]

    def one_step(k):
        out = step_fn(
            False, True, state[0], state[1], state[2], state[3],
            images_u8, offsets, seq, sent_input, None, k,
        )
        state[0], state[1], state[2], state[3] = out[:4]
        return out[4]

    # FLOPs from the compiled step; the AE's encode/decode lax.scans
    # under-report (loop body counted once — CLAUDE.md caveat) but the VGG
    # fwd+bwd dominates by ~2 orders of magnitude, so cross-check against the
    # analytic conv count: ~31 GFLOP/img forward x3 for fwd+bwd.  The 31
    # GFLOP figure assumes VGG-16 at the default 224 crop — assert that so a
    # future configurable crop/arch can't silently mislabel MFU.
    assert opt.crop_size == 224 and getattr(opt, "cnn_arch", "vgg16") == "vgg16", (
        f"wp analytic FLOP anchor assumes VGG-16 @224; got "
        f"{getattr(opt, 'cnn_arch', 'vgg16')} @{opt.crop_size}"
    )
    flops_per_step = _flops_per_step(
        "wp",
        31.0e9 * batch * 3,
        lambda: jax.jit(lambda *a: step_fn(False, True, *a)).lower(
            state[0], state[1], state[2], state[3],
            images_u8, offsets, seq, sent_input, None, step_rngs[-1],
        ),
    )

    it = iter(range(2 * steps))

    def chunk():
        return one_step(step_rngs[next(it)])

    # compile + warm (finetune specialisation) DIRECTLY before the wall
    # window: a dispatch after the cost_analysis remote compile (or a prior
    # workload's trace teardown) can stall ~10s through the tunnel, and with
    # the warmup earlier that stall landed inside the window (the 17.9
    # wall-img/s artifact in the round-4 dress rehearsal)
    loss = one_step(step_rngs[-1])
    jax.device_get(loss)

    # untraced wall window (see bench_train)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = chunk()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(chunk, steps)
    dev_s, n_mod = timing.module_seconds("jit_step")
    if dev_s is not None and n_mod != steps:
        _log(f"wp: WARNING trace captured {n_mod}/{steps} steps")
        dev_s = dev_s * steps / n_mod
    rec = db.summarize(
        flops_per_step=flops_per_step,
        device_s=dev_s,
        n_steps=steps,
        items_per_step=batch,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec.update(
        {
            "metric": "weakpaired_cnn_ae_train_throughput",
            "unit": "images_per_sec",
            "value": rec.get("items_per_sec"),
            "batch_size": batch,
            "phase": "finetune_cnn",
            "compute_dtype": opt.compute_dtype,
        }
    )
    return rec


def _make_jpeg_corpus(root: str, n_files: int, w: int = 640, h: int = 480):
    """Write a small synthetic JPEG corpus (photo-like smooth noise, so decode
    cost is realistic) and return a path list of ``n_files`` entries cycling
    over the distinct files."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    distinct = min(n_files, 16)
    rs = np.random.RandomState(7)
    paths = []
    for i in range(distinct):
        p = os.path.join(root, f"img_{i:03d}.jpg")
        if not os.path.exists(p):
            base = rs.rand(h // 8, w // 8, 3)
            img = np.kron(base, np.ones((8, 8, 1)))  # smooth blocks
            img += rs.rand(h, w, 3) * 0.1
            Image.fromarray((img * 255 / img.max()).astype(np.uint8)).save(
                p, quality=90
            )
        paths.append(p)
    return [paths[i % distinct] for i in range(n_files)]


def _fixed_synthetic_vgg16_weights() -> str:
    """Write (once) a deterministic synthetic VGG-16 weight npz and return its
    path — the bench loads FIXED weights through the real ``--weights`` path
    instead of falling into build_model's random-init branch (which rightly
    warns that features are meaningless for accuracy; for timing the values
    are irrelevant but the artifact should be reproducible and warning-free)."""
    w_path = "/tmp/nvqa_bench_vgg16_weights.npz"
    if not os.path.exists(w_path):
        import jax

        from novel_vqa_tpu.core.checkpoint import save_npz
        from novel_vqa_tpu.models.vision import vgg

        cfg = vgg.VGGConfig(arch="vgg16", image_size=224)
        params = jax.device_get(vgg.init_params(jax.random.PRNGKey(123), cfg))
        save_npz(w_path, params)
    return w_path


def bench_fc7():
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.data.images import DecodePool
    from novel_vqa_tpu.train.extract_features import (
        build_model,
        run_pipelined_extraction,
    )

    batch = int(os.environ.get("BENCH_FC7_BATCH", 32))
    # 640 = 20 traced batches of 32 (VERDICT round-2: 6 was thin statistics)
    n_images = int(os.environ.get("BENCH_FC7_IMAGES", 640))
    n_images = max(batch, (n_images // batch) * batch)
    workers = int(os.environ.get("BENCH_FC7_WORKERS", 8))

    paths = _make_jpeg_corpus("/tmp/nvqa_bench_jpegs", n_images)
    model = build_model(
        "vgg16", _fixed_synthetic_vgg16_weights(), "fc7", 123, batch,
        compute_dtype=os.environ.get("BENCH_FC7_DTYPE", "float32"),
    )
    forward, size, crop, _ = model

    # decode once up front: (a) measures the host decode-pool rate in
    # isolation, (b) lets the device loop run back-to-back batches so the
    # trace measures pure chip throughput (the /chip BASELINE metric)
    pool = DecodePool(size, crop, workers=workers)
    t0 = time.perf_counter()
    host_triples = list(pool.iter_batches(paths, batch))
    host_batches = [(u8, missing) for u8, missing, _ in host_triples]
    decode_wall = time.perf_counter() - t0
    pool.close()
    decode_rate = n_images / decode_wall

    fast_rate = None
    try:
        from novel_vqa_tpu.data import native_images

        if native_images.available():
            t0 = time.perf_counter()
            native_images.decode_batch_native(paths, size, False, workers,
                                              fast_scale=True)
            fast_rate = n_images / (time.perf_counter() - t0)
    except Exception as e:  # diagnostics only
        _log("fc7: fast-decode rate unavailable:", repr(e))

    dev_batches = [
        (jnp.asarray(u8), jnp.asarray(m)) for u8, m in host_batches
    ]
    out = forward(*dev_batches[0])
    jax.device_get(out)  # compile + warm

    lowered_flops = None
    try:
        # build_model returns a partial over the jitted forward
        import functools

        fwd = forward
        if isinstance(fwd, functools.partial):
            cost = fwd.func.lower(*fwd.args, *dev_batches[0]).compile().cost_analysis()
        else:
            cost = fwd.lower(*dev_batches[0]).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        lowered_flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover - diagnostics only
        _log("fc7: cost_analysis unavailable:", e)
    # VGG-16 fwd is ~15.5 GMAC = ~31 GFLOP/image at 224^2 (2xMAC convention,
    # matching cost_analysis and the MXU peak accounting) — sanity anchor
    analytic = 31.0e9 * batch
    flops_per_batch = lowered_flops or analytic
    _log(
        f"fc7: flops/batch cost={lowered_flops and f'{lowered_flops:.3e}'} "
        f"analytic~{analytic:.3e}"
    )

    it = iter(dev_batches * 3)

    def one_batch():
        return forward(*next(it))

    # untraced wall window (see bench_train/bench_inception: wall measured
    # inside the profiler trace is a known artifact); the fc7 record ALSO
    # carries the pipelined-loop sustained rate below, which is the
    # end-to-end wall figure that matters for this workload
    t0 = time.perf_counter()
    for _ in range(len(dev_batches)):
        out = one_batch()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(one_batch, len(dev_batches))
    dev_s, n_mod = timing.module_seconds("jit_")
    if dev_s is not None and n_mod != len(dev_batches):
        _log(f"fc7: WARNING trace captured {n_mod}/{len(dev_batches)} batches")
        dev_s = dev_s * len(dev_batches) / n_mod
    rec = db.summarize(
        flops_per_step=flops_per_batch,
        device_s=dev_s,
        n_steps=len(dev_batches),
        items_per_step=batch,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec.update(
        {
            "metric": "fc7_extraction_throughput",
            "unit": "images_per_sec_per_chip",
            "value": rec.get("items_per_sec"),
            "batch_size": batch,
            "decode_images_per_sec": round(decode_rate, 2),
            "decode_images_per_sec_fast": fast_rate and round(fast_rate, 2),
            "decode_workers": workers,
        }
    )
    # modeled sustained rate (perfect decode/compute overlap = slower stage)
    if rec.get("items_per_sec"):
        rec["sustained_images_per_sec_modeled"] = round(
            min(rec["items_per_sec"], decode_rate), 2
        )
    # MEASURED sustained rate: run the actual production pipelined loop
    # (decode pool overlapped with device dispatch + result fetch) end to end
    # over the same corpus and time the whole thing — every batch's features
    # cross back to host, so wall time here is a complete-pipeline figure,
    # not a device microbenchmark (VERDICT round-2 item 2).  NOTE: through
    # the axon tunnel this wall time also pays per-dispatch link latency that
    # a local host would not; the measured figure is therefore a LOWER bound
    # on sustained throughput.
    try:
        depth = int(os.environ.get("BENCH_FC7_DEPTH", 4))
        _, pipe_wall = run_pipelined_extraction(
            [model], paths, batch, workers, depth=depth
        )
        rec["sustained_images_per_sec_measured"] = round(n_images / pipe_wall, 2)
        rec["sustained_pipeline_wall_s"] = round(pipe_wall, 2)
        rec["sustained_pipeline_depth"] = depth
        rec["sustained_source"] = "measured_pipelined_loop"
        # second pass with --fast_decode (the recommended-config flag,
        # VERDICT round-3 item 1): same loop, DCT-downscaled decode — the
        # sustained figure is decode-bound on this 1-core host, so this is
        # where the fast path actually shows up end to end
        if fast_rate:
            _, fast_wall = run_pipelined_extraction(
                [model], paths, batch, workers, fast_decode=True, depth=depth
            )
            rec["sustained_images_per_sec_measured_fast"] = round(
                n_images / fast_wall, 2
            )
        # DECODE-FREE CONTROL (VERDICT round-4 item 6): the same loop fed
        # pre-decoded in-RAM batches — upload + dispatch + fetch only.  The
        # gap between this ceiling and the measured sustained rate is what
        # the decode stage costs end to end (including its competition with
        # the main thread for the single host core); it turns the "host
        # work steals the core" attribution into a measured number.
        _, ctl_wall = run_pipelined_extraction(
            [model], paths, batch, workers, depth=depth,
            predecoded=host_triples,
        )
        rec["sustained_images_per_sec_nodecode_control"] = round(
            n_images / ctl_wall, 2
        )
    except Exception as e:  # keep the device metric robust
        _log("fc7: measured sustained pipeline failed:", repr(e))
    return rec


def bench_eval_scan():
    """Secondary: full-split HBM-resident eval scan — the round-4 headline
    inference path (ONE ``lax.scan`` dispatch over the whole split + device
    argmax, a ~KB fetch), workload
    /root/reference/002_train_vqa_arch1/004_eval_model.lua:202-231.
    Driver-capture for the 592→60-118 s win that previously lived only in
    REHEARSAL_r4.json/PERF.md (VERDICT round-4 item 4).  Sized small enough
    to stay cheap in the bench budget (default 25k questions; the real
    novel_v2 test split is ~121.5k — device ms/question is scale-free)."""
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.models.vqa import arch1

    batch_size = int(os.environ.get("BENCH_EVAL_BATCH", 500))
    n_questions = int(os.environ.get("BENCH_EVAL_QUESTIONS", 25_000))
    n_images = int(os.environ.get("BENCH_EVAL_IMAGES", 10_000))
    chunks = int(os.environ.get("BENCH_EVAL_CHUNKS", 3))
    n_batches = -(-n_questions // batch_size)

    cfg = arch1.Arch1Config(vocab_size=12782)
    params = arch1.init_params(jax.random.PRNGKey(123), cfg)
    seq = 16
    rs = np.random.RandomState(0)
    lengths = rs.randint(3, seq + 1, size=n_questions)
    cols = np.arange(seq)[None, :]
    tokens_h = np.where(
        cols >= (seq - lengths[:, None]),
        rs.randint(1, cfg.vocab_size, size=(n_questions, seq)), 0,
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
        # MC choices so the scan exercises the argmax-over-choices head too
        # (004_eval_model.lua's OE+MC dual output)
        "mc_ans": jnp.asarray(
            rs.randint(1, cfg.num_output + 1, size=(n_questions, 18)), jnp.int32
        ),
    }

    # forward-only FLOPs: one eval batch, cross-checked against the analytic
    # count (= train analytic / 3 — the scan itself undercounts, loop body
    # counted once; CLAUDE.md trace caveats)
    flops_per_dispatch = n_batches * _flops_per_step(
        "eval_scan",
        db.analytic_flops_arch1_step(cfg, batch_size, seq) / 3.0,
        lambda: arch1.eval_step_indexed.lower(
            cfg, params, data, jnp.zeros((batch_size,), jnp.int32)
        ),
    )

    def one():
        return arch1.eval_predict_scan(cfg, params, data, n_batches, batch_size)

    out = one()
    jax.device_get(out)  # compile + warm

    # untraced wall window (see bench_train); dispatches are independent,
    # forcing the last output forces the queue on a single ordered stream
    t0 = time.perf_counter()
    for _ in range(chunks):
        out = one()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(one, chunks)
    dev_s, n_mod = timing.module_seconds("jit_eval_predict_scan")
    if dev_s is not None and n_mod != chunks:
        _log(f"eval_scan: WARNING trace captured {n_mod}/{chunks} dispatches")
        dev_s = dev_s * chunks / n_mod
    rec = db.summarize(
        flops_per_step=flops_per_dispatch,
        device_s=dev_s,
        n_steps=chunks,
        items_per_step=n_batches * batch_size,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec.update(
        {
            "metric": "vqa_eval_scan_throughput",
            "unit": "questions_per_sec_per_chip",
            "value": rec.get("items_per_sec"),
            "batch_size": batch_size,
            "n_questions": n_batches * batch_size,
            "device_ms_per_question": (
                round(rec["device_step_ms"] / (n_batches * batch_size), 6)
                if rec.get("device_step_ms") else None
            ),
        }
    )
    return rec


def bench_inception():
    """Secondary: Inception-v3 pool-tap extraction at the recommended config
    (bs 128, bf16 storage, 4-way branch fusion — docs/PERF.md round-4 A/B),
    workload /root/reference/002_train_vqa_arch1/001_prepro_img_inc.lua:34-57.
    Pure device metric (synthetic fixed weights, pre-staged batches) like the
    PERF sweep rows; ~7-8 min through the tunnel (compile + trace), skippable
    with BENCH_SKIP_INC=1."""
    import jax
    import jax.numpy as jnp

    from novel_vqa_tpu.core import device_bench as db
    from novel_vqa_tpu.data.images import inception_device_prepro
    from novel_vqa_tpu.models.vision import inception as inc
    from novel_vqa_tpu.models.vision.layers import bf16_storage_cast

    batch = int(os.environ.get("BENCH_INC_BATCH", 128))
    dtype = os.environ.get("BENCH_INC_DTYPE", "bfloat16")
    steps = int(os.environ.get("BENCH_INC_STEPS", 20))
    if dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"BENCH_INC_DTYPE={dtype!r}: must be 'float32' or 'bfloat16'"
        )

    cfg = inc.InceptionConfig()
    params = jax.device_get(inc.init_params(jax.random.PRNGKey(123), cfg))
    if dtype == "bfloat16":
        params = bf16_storage_cast(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    @jax.jit
    def forward(params, u8, missing):
        return inc.apply(
            params, cfg, inception_device_prepro(u8, missing), tap="pool"
        )

    rs = np.random.RandomState(0)
    batches = [
        (
            jnp.asarray(
                rs.randint(0, 256, size=(batch, 299, 299, 3), dtype=np.uint8)
            ),
            jnp.asarray(np.zeros(batch, bool)),
        )
        for _ in range(4)
    ]
    out = forward(params, *batches[0])
    jax.device_get(out)

    flops = None
    try:
        cost = forward.lower(params, *batches[0]).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # diagnostics only
        _log("inception: cost_analysis unavailable:", repr(e))

    it = iter(range(2 * steps))

    def one():
        return forward(params, *batches[next(it) % len(batches)])

    # untraced wall window (see bench_train: wall measured inside the
    # profiler trace is a known artifact) — dispatches are independent, so
    # force completion of the LAST one after draining the loop
    t0 = time.perf_counter()
    for _ in range(steps):
        out = one()
    jax.device_get(out)
    untraced_wall_s = time.perf_counter() - t0

    timing = db.measure_device_time(one, steps)
    dev_s, n_mod = timing.module_seconds("jit_forward")
    if dev_s is not None and n_mod != steps:
        _log(f"inception: WARNING trace captured {n_mod}/{steps} batches")
        dev_s = dev_s * steps / n_mod
    rec = db.summarize(
        flops_per_step=flops,
        device_s=dev_s,
        n_steps=steps,
        items_per_step=batch,
        wall_s=untraced_wall_s,
        peak=db.peak_flops(),
    )
    rec.update(
        {
            "metric": "inception_extraction_throughput",
            "unit": "images_per_sec_per_chip",
            "value": rec.get("items_per_sec"),
            "batch_size": batch,
            "compute_dtype": dtype,
            "branch_fusion": os.environ.get("NOVEL_VQA_INC_FUSE", "1") != "0",
            "stem_lane_packing": os.environ.get("NOVEL_VQA_INC_PACK", "0") == "1",
        }
    )
    return rec


def main():
    from novel_vqa_tpu.core import compile_cache

    _start_watchdog()  # mid-run hang guard: flush partial record + exit
    _progress["stage"] = "backend_probe"
    wait_for_backend()  # bounded tunnel-outage guard: hang -> wait or loud error
    # The bench (unlike the CLIs/tests) defaults the persistent compile
    # cache ON: the driver runs `python bench.py` with no env at round end,
    # and real-shape tunnel compiles are the one cost that can push a cold
    # full default set past the BENCH_DEADLINE watchdog — any earlier
    # same-host bench run pre-warms the cache for it.  Degrades to a no-op
    # when the backend doesn't serialize executables (core/compile_cache.py
    # scope notes); NOVEL_VQA_COMPILE_CACHE=0 opts out, any other value
    # overrides the directory.
    os.environ.setdefault("NOVEL_VQA_COMPILE_CACHE", "/tmp/nvqa_bench_xla_cache")
    compile_cache.maybe_enable()
    _progress["stage"] = "train"
    try:
        train = bench_train()
    except Exception as e:
        # a primary-workload failure (e.g. the tunnel dying mid-run) must
        # still leave ONE parseable JSON line for the driver, like the
        # wait_for_backend give-up path
        if not _claim_emit():  # watchdog already emitted
            raise SystemExit(1)
        print(json.dumps({
            "metric": "vqa_arch1_train_throughput",
            "value": None,
            "unit": "qa_pairs_per_sec",
            "vs_baseline": None,
            "error": f"primary train bench failed: {e!r}",
        }), flush=True)
        raise SystemExit(1)
    _progress["train"] = train
    base = _load_baseline()

    secondary = _progress["secondary"]
    # ordered by importance: if the watchdog deadline fires mid-run, the
    # partial record keeps the highest-value rows
    if os.environ.get("BENCH_SKIP_FC7", "0") != "1":
        _progress["stage"] = "fc7"
        try:
            fc7 = bench_fc7()
            if fc7.get("value") and base.get("torch_cpu_fc7_images_per_sec"):
                fc7["vs_baseline"] = round(
                    fc7["value"] / base["torch_cpu_fc7_images_per_sec"], 2
                )
            secondary.append(fc7)
        except Exception as e:  # keep the primary metric robust
            _log("fc7 bench failed:", repr(e))
    if os.environ.get("BENCH_SKIP_INC", "0") != "1":
        _progress["stage"] = "inception"
        try:
            secondary.append(bench_inception())
        except Exception as e:  # keep the primary metric robust
            _log("inception bench failed:", repr(e))
    if os.environ.get("BENCH_SKIP_EVAL", "0") != "1":
        _progress["stage"] = "eval_scan"
        try:
            secondary.append(bench_eval_scan())
        except Exception as e:
            _log("eval_scan bench failed:", repr(e))
    # arch2 is opt-OUT (VERDICT round-4 item 7: the second north-star
    # architecture must appear in the driver artifact without env flags);
    # BENCH_ARCH2=0 / BENCH_SKIP_ARCH2=1 both skip
    if (os.environ.get("BENCH_SKIP_ARCH2", "0") != "1"
            and os.environ.get("BENCH_ARCH2", "1") != "0"):
        _progress["stage"] = "arch2"
        try:
            secondary.append(bench_arch2())
        except Exception as e:
            _log("arch2 bench failed:", repr(e))
    if os.environ.get("BENCH_SKIP_WP", "0") != "1":
        _progress["stage"] = "weakpaired"
        try:
            secondary.append(bench_weakpaired())
        except Exception as e:
            _log("weakpaired bench failed:", repr(e))
    if os.environ.get("BENCH_SKIP_AE", "0") != "1":
        _progress["stage"] = "text_ae"
        try:
            ae_rec = bench_text_ae()
            if ae_rec.get("value") and base.get("torch_cpu_text_ae_sentences_per_sec"):
                ae_rec["vs_baseline"] = round(
                    ae_rec["value"] / base["torch_cpu_text_ae_sentences_per_sec"], 2
                )
            secondary.append(ae_rec)
        except Exception as e:
            _log("text_ae bench failed:", repr(e))

    if _claim_emit():
        _emit_final(train, secondary, base)


if __name__ == "__main__":
    main()
