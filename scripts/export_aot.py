"""Export committed AOT bundles for every compile-heavy program in the
bench's default matrix + the serving deploy set.

    python scripts/export_aot.py [--out aot_bundles] [--only train,decode,..]

Exports (each a ``*.jaxexe`` via utils.aot / jax serialize_executable,
compiled FRESH — bypassing the persistent cache, see
Sampler._fresh_compile):

- train programs (tens / grad / upd) for each bench train section
  (bench._TRAIN_SECTION_KW) — deduped by program key: one upd bundle covers
  every section, one tens bundle per batch size;
- the tensorize-bench program (B=16384, with_detrend);
- serving decode for pallas / pallas_full / xla at B in {128, 512} and the
  encode program at B=128 — the same bundles `scripts/serve.py --aot-dir`
  preloads for a <10 s daemon cold start (VERDICT r4 item 7).

Run this as the LAST act after any pctd_tpu source change: bundles pin the
package-source fingerprint and a later edit invalidates them (loaders fall
back to compiling). Expect ~1-2 h of compile on a cold run; re-runs skip
bundles whose file already exists (delete aot_bundles/ to force).

The reference has no analog (eager torch never compiles); this is the
compiled-runtime answer to its instant start (reference train.py:69-72,
model.py:117-143).
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _log(msg):
    print(f"[export_aot] {msg}", file=sys.stderr, flush=True)


def export_trains(out_dir: str, report: dict):
    import jax

    from pctd_tpu.train import aot_steps, schedules

    bench = _load_bench()
    for label, kw in bench._TRAIN_SECTION_KW.items():
        mcfg, tcfg = bench._train_cfgs(**kw)
        tx = schedules.make_optimizer(tcfg)
        keys = aot_steps.program_keys(mcfg, tcfg)
        _log(f"{label}: keys {keys}")
        t0 = time.perf_counter()
        r = aot_steps.export_train_step(mcfg, tcfg, tx, out_dir)
        _log(f"{label}: exported {len(r['exported'])} "
             f"(skipped existing {len(r['skipped_existing'])}) "
             f"in {time.perf_counter() - t0:.1f}s")
        report.setdefault("train", []).append({"section": label, **r})
        del tx
        jax.clear_caches()


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "pctd_bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def export_tensorize(out_dir: str, report: dict):
    import jax
    import jax.numpy as jnp

    from pctd_tpu.models.sampler import Sampler
    from pctd_tpu.utils import aot

    bench = _load_bench()
    B = bench._TENSORIZE_BATCH
    path = os.path.join(out_dir, f"tensorize_bench_b{B}.jaxexe")
    if os.path.exists(path):
        _log(f"tensorize_bench_b{B}: exists, skipping")
        return
    pr = jax.ShapeDtypeStruct((B, 32, 128), jnp.uint8)
    chord = jax.ShapeDtypeStruct((B, 8, 14), jnp.float32)
    shift = jax.ShapeDtypeStruct((B,), jnp.int32)
    t0 = time.perf_counter()
    exe = Sampler._fresh_compile(
        jax.jit(bench.tensorize_bench_fn()).lower(pr, chord, shift))
    aot.save_exe(exe, path, kind="tensorize_bench", batch=B)
    dt = round(time.perf_counter() - t0, 1)
    _log(f"tensorize_bench_b{B}: compiled {dt}s")
    report["tensorize"] = {"compile_s": dt}


def export_serving(out_dir: str, report: dict,
                   batches=(128, 512), backends=("pallas", "pallas_full",
                                                 "xla")):
    import jax

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.models.sampler import Sampler

    cfg = ModelConfig()
    params = dv.init_params(jax.random.PRNGKey(0), cfg)
    for i, backend in enumerate(backends):
        # a batch needs (re)export when EITHER its decode or its encode
        # bundle is missing (a crash between the two must be resumable —
        # keying on decode alone left missing encode bundles unrecoverable)
        todo = [b for b in batches
                if not os.path.exists(os.path.join(
                    out_dir, f"decode_{backend}_b{b}.jaxexe"))
                or not os.path.exists(os.path.join(
                    out_dir, f"encode_b{b}.jaxexe"))]
        if not todo:
            _log(f"decode_{backend}: all batches exist, skipping")
            continue
        sampler = Sampler(params, cfg, frame_decoder=backend)
        # export_aot writes encode alongside decode for 1-chip samplers;
        # an already-present decode file in `todo` is recompiled — cheap
        # relative to leaving the pair incomplete
        _log(f"{backend}: exporting batches {todo}")
        r = sampler.export_aot(out_dir, batches=todo)
        report.setdefault("serving", []).append(
            {"backend": backend, **{k: r[k] for k in ("exported",)}})
        for e in r["exported"]:
            _log(f"  {e['kind']} b{e['batch']}: {e['compile_s']}s")
        del sampler
        jax.clear_caches()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=os.path.join(REPO, "aot_bundles"))
    ap.add_argument("--only", default="train,tensorize,serving",
                    help="comma list of train,tensorize,serving")
    args = ap.parse_args()

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    only = set(args.only.split(","))
    os.makedirs(args.out, exist_ok=True)
    report = {}
    t0 = time.perf_counter()
    if "serving" in only:
        export_serving(args.out, report)
    if "tensorize" in only:
        export_tensorize(args.out, report)
    if "train" in only:
        export_trains(args.out, report)
    report["total_seconds"] = round(time.perf_counter() - t0, 1)
    sizes = {n: os.path.getsize(os.path.join(args.out, n)) // 1024
             for n in sorted(os.listdir(args.out)) if n.endswith(".jaxexe")}
    report["bundle_kib"] = sizes
    report["total_mib"] = round(sum(sizes.values()) / 1024, 1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
