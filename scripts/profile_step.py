#!/usr/bin/env python
"""Device-time breakdown of the headline train step (MFU bound evidence).

Two modes, both feeding the ARCHITECTURE.md roofline argument for the
B=2048 bf16 fused-kernel train step (reference hot loop: ptvae.py:430-491):

1. default — ``jax.profiler.trace`` around N steady-state steps, then parse
   the generated Perfetto/Chrome trace and aggregate device-track op
   durations into categories (pallas kernel custom-calls, MXU
   convolution/dot fusions, scan-carry writes, other fusions, ...). This is
   the measured answer to "where do the non-MXU milliseconds go".

2. ``--sweep`` — time the grad program at several batch sizes with the
   backward's 128-row block fixed, and fit t = a + b * n_blocks. Pallas
   grid blocks execute SEQUENTIALLY on the single TPU core, so ``b`` is the
   per-block cost; comparing it with the block's matmul-FLOP time at peak
   isolates the serial-chain latency the block pays on top of its MXU work.

Usage:
    python scripts/profile_step.py [--batch 2048] [--steps 4] [--out DIR]
    python scripts/profile_step.py --sweep
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build(batch: int, dtype: str = "bfloat16"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pctd_tpu.config import ModelConfig, TrainConfig
    from pctd_tpu.data.synthetic import example_batch
    from pctd_tpu.train.trainer import init_state, make_train_step

    mcfg = dataclasses.replace(ModelConfig(), compute_dtype=dtype,
                               remat_frames=True, train_frame_kernel=True)
    tcfg = TrainConfig(batch_size=batch)
    state, tx = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx)
    pr, chord, shift = example_batch(batch, seed=0)
    return step, state, (jnp.asarray(pr), jnp.asarray(chord),
                         jnp.asarray(shift))


def _run_steps(step, state, batch_args, n: int):
    st = state
    m = None
    for _ in range(n):
        st, m = step(st, *batch_args)
    float(m["loss"])
    return st


CATEGORIES = (
    # (label, match) — first match wins; names come from the XLA thunk/op
    # names on the device track of the trace.
    ("pallas train_frame fwd", ("train_frame_fwd",)),
    ("pallas train_frame bwd", ("train_frame_bwd",)),
    ("pallas (other)", ("pallas", "mosaic", "custom-call", "tpu_custom")),
    ("matmul/conv fusions", ("convolution", "dot", "gemm")),
    ("scan-carry writes", ("dynamic-update-slice", "dynamic_update_slice")),
    ("copies/transposes", ("copy", "transpose", "bitcast")),
    ("reduces", ("reduce", "all-reduce")),
    ("other fusions", ("fusion", "loop_")),
)


def _categorize(name: str) -> str:
    low = name.lower()
    for label, keys in CATEGORIES:
        if any(k in low for k in keys):
            return label
    return "misc"


def _parse_trace(trace_dir: str) -> dict:
    """Aggregate device-track complete events from the newest trace.json.gz
    under ``trace_dir``; returns {category: total_ms} plus step stats."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = (ev.get("args") or {}).get("name", "")
            if any(s in pname for s in ("TPU", "Device", "/device:")):
                dev_pids.add(ev["pid"])
    # exclude steps/run_ids rollup tracks (they double-count ops)
    skip_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tname = (ev.get("args") or {}).get("name", "")
            if any(s in tname.lower() for s in ("step", "run ids", "scope")):
                skip_tids.add((ev["pid"], ev["tid"]))
    agg = defaultdict(float)
    count = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if (ev["pid"], ev.get("tid")) in skip_tids:
            continue
        cat = _categorize(ev.get("name", ""))
        agg[cat] += ev.get("dur", 0) / 1e3      # us -> ms
        count[cat] += 1
    return {"by_category_ms": dict(sorted(
        agg.items(), key=lambda kv: -kv[1])),
        "op_counts": dict(count), "trace_path": paths[-1]}


def main_profile(args):
    import jax

    from pctd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    step, state, batch_args = _build(args.batch)
    state = _run_steps(step, state, batch_args, 2)      # compile + warmup

    t0 = time.perf_counter()
    state = _run_steps(step, state, batch_args, args.steps)
    wall = (time.perf_counter() - t0) / args.steps

    out = args.out or os.path.join(REPO, "runs", "profile_step")
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        state = _run_steps(step, state, batch_args, args.steps)

    rep = _parse_trace(out)
    total = sum(rep["by_category_ms"].values())
    per_step = {k: round(v / args.steps, 2)
                for k, v in rep["by_category_ms"].items()}
    result = {
        "batch": args.batch, "steps_traced": args.steps,
        "wall_ms_per_step": round(wall * 1e3, 1),
        "device_ms_per_step_total": round(total / args.steps, 1),
        "device_ms_per_step": per_step,
        "op_counts_per_step": {k: v // args.steps
                               for k, v in rep["op_counts"].items()},
        "trace": rep["trace_path"],
    }
    print(json.dumps(result, indent=1))


def main_sweep(args):
    import jax

    from pctd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rows = []
    for batch in args.sweep_batches:
        step, state, batch_args = _build(batch)
        state = _run_steps(step, state, batch_args, 2)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = _run_steps(step, state, batch_args, 4)
            reps.append((time.perf_counter() - t0) / 4)
        dt = sorted(reps)[1]
        n_blocks = -(-batch // 128)     # backward block rows (train_frame)
        rows.append({"batch": batch, "ms_per_step": round(dt * 1e3, 2),
                     "bwd_blocks": n_blocks,
                     "seg_per_s": round(batch / dt, 1)})
        print(json.dumps(rows[-1]), flush=True)
    # least-squares t = a + b * n_blocks
    xs = [r["bwd_blocks"] for r in rows]
    ys = [r["ms_per_step"] for r in rows]
    n = len(rows)
    mx, my = sum(xs) / n, sum(ys) / n
    b = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
         / sum((x - mx) ** 2 for x in xs))
    a = my - b * mx
    print(json.dumps({"fit": {"intercept_ms": round(a, 2),
                              "per_block_ms": round(b, 3),
                              "batches": xs}}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep-batches", type=int, nargs="*",
                    default=[128, 256, 512, 1024, 2048])
    args = ap.parse_args()
    if args.sweep:
        main_sweep(args)
    else:
        main_profile(args)
