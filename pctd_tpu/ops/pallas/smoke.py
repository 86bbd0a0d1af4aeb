"""On-device AOT compile-smoke gate for every Pallas kernel entry.

Interpret-mode parity tests cannot catch Mosaic LOWERING failures
(layout/alignment/VMEM), and three such regressions reached the device in
round 2 — one of them (the full_decoder dur-bits store at B>=512) crashed
the unattended driver bench. This gate AOT-compiles — ``.lower().compile()``,
no execution — each kernel entry over a realistic batch matrix, using the
persistent compilation cache so re-runs cost seconds. ``bench.py`` runs it
before any timed section; ``scripts/kernel_smoke.py`` is the CLI;
``tests/test_kernel_smoke.py`` subprocess-runs it on the chip.

Covers the serving decode chain (reference semantics ptvae.py:430-491) and
the fused train kernels (train step semantics ptvae.py:370-491 +
model.py:57-68).
"""
from __future__ import annotations

import functools
import time
from typing import Dict, Iterable, Optional, Tuple

SERVE_BATCHES = (128, 300, 512, 2048)
TRAIN_BATCHES = (128, 512, 2048)


def _compile_serve(backend: str, batch: int) -> None:
    import jax

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models import disentangle_vae as dv

    mcfg = ModelConfig()
    params = jax.eval_shape(
        lambda: dv.init_params(jax.random.PRNGKey(0), mcfg))
    z_chd = jax.ShapeDtypeStruct((batch, mcfg.chd_z_dim), "float32")
    z_rhy = jax.ShapeDtypeStruct((batch, mcfg.txt_z_dim), "float32")
    f = jax.jit(functools.partial(dv.decode_z, cfg=mcfg,
                                  frame_decoder=backend))
    f.lower(params, z_chd=z_chd, z_rhy=z_rhy).compile()


def _compile_train(which: str, batch: int) -> None:
    """AOT-compile the loss+grad program (where the Pallas train kernels
    live; the tensorize/update programs are pure XLA)."""
    import dataclasses

    import jax

    from pctd_tpu.config import ModelConfig, TrainConfig
    from pctd_tpu.data.synthetic import example_batch
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.train.trainer import batch_features

    kernel, _, mode = which.partition(":")
    mcfg = dataclasses.replace(
        ModelConfig(), compute_dtype="bfloat16",
        remat_frames=True,
        train_frame_kernel=(kernel == "train_frame"),
        fused_loss=(mode != "nofuse"))
    tcfg = TrainConfig(batch_size=batch)
    params = jax.eval_shape(
        lambda: dv.init_params(jax.random.PRNGKey(0), mcfg))
    pr0, c0, s0 = example_batch(1)
    abstract = [jax.ShapeDtypeStruct((batch,) + a.shape[1:], a.dtype)
                for a in (pr0, c0, s0)]
    x, c, pr_mat, dt_x = jax.eval_shape(
        functools.partial(batch_features, mcfg=mcfg), *abstract)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    def loss_fn(p, key, x, c, pr_mat, dt_x):
        return dv.loss(p, mcfg, key, x, c, pr_mat, dt_x,
                       tfr1=0.5, tfr2=0.5, tfr3=0.5, beta=0.1,
                       weights=tcfg.weights,
                       weighted_dur=tcfg.weighted_dur)

    if mode == "eval":
        # the no-grad loss program (val epoch): same kernels in PRIMAL
        # mode — a distinct Mosaic program from the VJP path's stash
        # forward, so it gets its own gate entry
        jax.jit(loss_fn).lower(params, key, x, c, pr_mat, dt_x).compile()
        return

    def grad_fn(p, key, x, c, pr_mat, dt_x):
        (_, m), g = jax.value_and_grad(
            lambda q: loss_fn(q, key, x, c, pr_mat, dt_x),
            has_aux=True)(p)
        return m, g

    jax.jit(grad_fn).lower(params, key, x, c, pr_mat, dt_x).compile()


def run_gate(serve_batches: Iterable[int] = SERVE_BATCHES,
             train_batches: Iterable[int] = TRAIN_BATCHES,
             which: Optional[Iterable[str]] = None,
             extended: bool = False,
             ) -> Tuple[Dict[str, dict], bool]:
    """AOT-compile every (kernel, batch) combo; never raises.

    Returns (results, all_ok) where results[label] = {"ok": bool,
    "seconds": float[, "error": str]}.

    Default matrix = DRIVER-PATH kernels only: the two serving decode
    backends plus the fused train-frame kernel (in-kernel CE — the headline
    train config). ``extended=True`` adds the non-default programs — the
    logits-out ``nofuse`` fallback and the no-grad kernel ``eval`` primal
    (unused since round 4: Trainer eval runs the XLA path). Round 3's gate
    compiled everything unconditionally and alone cost 1,574 s on a cold
    cache (BENCH_r03), starving the driver bench — the extras gate nothing
    the default train/serve paths execute. (The train_seq whole-sequence
    kernel was deleted in round 5 — see ARCHITECTURE.md "Retired
    experiments".)
    """
    from pctd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jobs = []
    for b in serve_batches:
        jobs.append((f"serve_pallas_b{b}",
                     functools.partial(_compile_serve, "pallas", b)))
        jobs.append((f"serve_pallas_full_b{b}",
                     functools.partial(_compile_serve, "pallas_full", b)))
    for b in train_batches:
        # train_frame compiles with the fused_loss default (in-kernel CE)
        jobs.append((f"train_frame_b{b}",
                     functools.partial(_compile_train, "train_frame", b)))
        if extended:
            jobs.append((f"train_frame_nofuse_b{b}",
                         functools.partial(
                             _compile_train, "train_frame:nofuse", b)))
            jobs.append((f"train_frame_eval_b{b}",
                         functools.partial(
                             _compile_train, "train_frame:eval", b)))
    if which is not None:
        keep = tuple(which)
        jobs = [(lbl, fn) for lbl, fn in jobs
                if any(lbl.startswith(k) or k in lbl for k in keep)]

    import sys

    results: Dict[str, dict] = {}
    ok = True
    for label, fn in jobs:
        # stream progress: first compiles run minutes each on this stack, and
        # a silent multi-minute gate is indistinguishable from a hang
        print(f"[gate] {label}: compiling...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            fn()
            results[label] = {"ok": True,
                              "seconds": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — the gate must never raise
            ok = False
            results[label] = {
                "ok": False,
                "seconds": round(time.perf_counter() - t0, 1),
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
        r = results[label]
        print(f"[gate] {label}: {'ok' if r['ok'] else 'FAIL ' + r['error']}"
              f" ({r['seconds']}s)", file=sys.stderr, flush=True)
    return results, ok
