"""Serving daemon: the four latent-control workflows as a long-running
JSON-lines service.

The reference runs its controllable-generation workflows as one-off
notebook/script calls; for production serving this process loads a
checkpoint ONCE, compiles each workflow program ONCE (fixed-batch shape
discipline via ``Sampler(fixed_batch=N)`` — arbitrary request sizes are
padded/chunked, never recompiled), and then answers requests over
stdin/stdout, one JSON object per line:

    {"op": "ping"}
    {"op": "style_transfer", "content": "a.mid", "style": "b.mid",
     "out": "out.mid", "fix": "chord"}          # fix: chord | texture
    {"op": "variation", "input": "a.mid", "out": "v.mid", "scale": 0.5,
     "seed": 3}                                  # posterior sampling
    {"op": "prior", "input": "a.mid", "out": "p.mid",
     "sample": "texture", "seed": 0}             # texture | chord | both
    {"op": "interp", "a": "a.mid", "b": "b.mid", "out": "i_%02d.mid",
     "count": 5, "what": "chord"}                # chord | texture | both
    {"op": "reload", "checkpoint": "path"}       # hot-swap weights, no
                                                 # recompile (same shapes)
    {"op": "stats"}                              # per-op latency histogram
    {"op": "quit"}

Responses: {"ok": true, "out": ..., "windows": N, "ms": T} or
{"ok": false, "error": "..."}. The loop survives malformed lines (bad JSON,
non-object payloads, missing files) — each gets an ok:false reply.

Usage:
    python scripts/serve.py --checkpoint runs/result_*/models/disvae_valid \
        [--fixed-batch 16] [--frame-decoder auto] [--data-parallel]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def features(pr, chord, spec):
    import jax.numpy as jnp

    from pctd_tpu.data.tensorize import tensorize_batch

    feats = tensorize_batch(jnp.asarray(pr), jnp.asarray(chord),
                            jnp.zeros(len(pr), jnp.int32), spec=spec,
                            with_detrend=False)
    return feats["pr_mat"], feats["c"]


def write_grids(path: str, grids, bpm: float, spec):
    import numpy as np

    from pctd_tpu.data import demo as dm

    segments = [dm.grid_to_pr_and_notes(np.asarray(g), bpm=bpm,
                                        spec=spec)[1] for g in grids]
    dm.write_demo(path, [segments], ["generated"], bpm=bpm, shift_beat=8)
    return sum(len(s) for s in segments if s)


def _percentile(sorted_ms, q):
    if not sorted_ms:
        return None
    i = min(len(sorted_ms) - 1, int(round(q * (len(sorted_ms) - 1))))
    return round(sorted_ms[i], 1)


class Server:
    def __init__(self, sampler, spec, max_windows: int = 64, cfg=None):
        self.s = sampler
        self.spec = spec
        self.max_windows = max_windows
        self.cfg = cfg
        self.latencies = {}          # op -> [ms, ...]

    def record(self, op: str, ms: float):
        self.latencies.setdefault(op or "?", []).append(ms)

    def stats(self) -> dict:
        out = {}
        for op, ms in self.latencies.items():
            s = sorted(ms)
            out[op] = {"count": len(s),
                       "p50_ms": _percentile(s, 0.50),
                       "p90_ms": _percentile(s, 0.90),
                       "p99_ms": _percentile(s, 0.99),
                       "max_ms": round(s[-1], 1)}
        return out

    def reload(self, path: str) -> None:
        """Hot-swap checkpoint weights. The jitted programs take params as a
        runtime argument, so no recompile happens — shapes are fixed by the
        config, and a structure mismatch raises before anything is swapped."""
        import jax

        from pctd_tpu.models.disentangle_vae import DisentangleVAE

        model = DisentangleVAE.from_train_checkpoint(path, self.cfg)
        old = jax.tree_util.tree_structure(self.s.params)
        new = jax.tree_util.tree_structure(model.params)
        if old != new:
            raise ValueError(f"checkpoint structure mismatch: {path}")
        self.s.params = model.params

    def _load(self, path):
        from pctd_tpu.data.songs import midi_to_windows

        pr, _, chord, bpm = midi_to_windows(path, self.max_windows)
        pr_mat, c = features(pr, chord, self.spec)
        return pr_mat, c, bpm

    def handle(self, req: dict) -> dict:
        import jax

        op = req.get("op")
        if op == "ping":
            return {"ok": True}
        if op == "stats":
            return {"ok": True, "stats": self.stats()}
        if op == "reload":
            self.reload(req["checkpoint"])
            return {"ok": True, "reloaded": req["checkpoint"]}
        if op == "style_transfer":
            pm1, c1, bpm = self._load(req["content"])
            pm2, c2, _ = self._load(req["style"])
            n = min(len(pm1), len(pm2))
            fix_chd = req.get("fix", "chord") == "chord"
            est = self.s.swap(pm1[:n], pm2[:n], c1[:n], c2[:n],
                              fix_rhy=not fix_chd, fix_chd=fix_chd)
            notes = write_grids(req["out"], est, bpm, self.spec)
            return {"ok": True, "out": req["out"], "windows": int(n),
                    "notes": int(notes)}
        if op == "variation":
            pm, c, bpm = self._load(req["input"])
            key = jax.random.PRNGKey(int(req.get("seed", 0)))
            est = self.s.posterior_sample(key, pm, c,
                                          scale=req.get("scale"))
            notes = write_grids(req["out"], est, bpm, self.spec)
            return {"ok": True, "out": req["out"], "windows": len(pm),
                    "notes": int(notes)}
        if op == "prior":
            pm, c, bpm = self._load(req["input"])
            key = jax.random.PRNGKey(int(req.get("seed", 0)))
            what = req.get("sample", "texture")
            est = self.s.prior_sample(key, pm, c,
                                      sample_chd=what in ("chord", "both"),
                                      sample_rhy=what in ("texture", "both"),
                                      scale=float(req.get("scale", 1.0)))
            notes = write_grids(req["out"], est, bpm, self.spec)
            return {"ok": True, "out": req["out"], "windows": len(pm),
                    "notes": int(notes)}
        if op == "interp":
            pm1, c1, bpm = self._load(req["a"])
            pm2, c2, _ = self._load(req["b"])
            n = min(len(pm1), len(pm2))
            count = int(req.get("count", 5))
            what = req.get("what", "chord")
            est = self.s.interp(pm1[:n], c1[:n], pm2[:n], c2[:n],
                                interp_chd=what in ("chord", "both"),
                                interp_rhy=what in ("texture", "both"),
                                int_count=count)
            outs = []
            # only %-format when an integer spec (%d / %03i ...) is present;
            # a literal '%' in the path (e.g. 'mix%final.mid') falls back to
            # the '.j.mid' suffix instead of raising or mangling the name
            import re
            has_int_spec = re.search(r"%[-+ #0]*\d*[di]", req["out"])
            for j in range(count):
                out = req["out"] % j if has_int_spec else \
                    f"{req['out']}.{j}.mid"
                write_grids(out, est[:, j], bpm, self.spec)
                outs.append(out)
            return {"ok": True, "out": outs, "windows": int(n)}
        raise ValueError(f"unknown op {op!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--fixed-batch", type=int, default=16)
    ap.add_argument("--max-windows", type=int, default=64)
    ap.add_argument("--frame-decoder", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_full"],
                    help="'auto' picks the fastest backend for the device "
                         "and degrades on kernel compile failure")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard request batches over all visible devices")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model dims (CI smoke, untrained)")
    ap.add_argument("--aot-dir", default=None,
                    help="directory of *.jaxexe AOT bundles: preload "
                         "compiled serving executables (seconds) instead of "
                         "compiling on first request (100-660 s cold)")
    ap.add_argument("--export-aot", default=None, metavar="DIR",
                    help="compile the serving programs for --fixed-batch, "
                         "serialize them to DIR, print a report, and exit "
                         "(run once per deploy; serve with --aot-dir DIR)")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu'; needed because "
                         "the axon TPU plugin ignores JAX_PLATFORMS set via "
                         "the environment)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import ModelConfig, tiny_model_config
    from pctd_tpu.models.disentangle_vae import DisentangleVAE
    from pctd_tpu.models.sampler import Sampler

    cfg = tiny_model_config() if args.tiny else ModelConfig()
    if args.checkpoint:
        model = DisentangleVAE.from_train_checkpoint(args.checkpoint, cfg)
        print(json.dumps({"loaded": args.checkpoint}), flush=True)
    else:
        model = DisentangleVAE.init_model(jax.random.PRNGKey(args.seed), cfg)
        print(json.dumps({"warning": "no checkpoint - untrained model"}),
              flush=True)

    mesh = None
    if args.data_parallel:
        from pctd_tpu.parallel import make_mesh
        mesh = make_mesh()
    sampler = Sampler(model.params, cfg, frame_decoder=args.frame_decoder,
                      mesh=mesh, fixed_batch=args.fixed_batch,
                      aot_dir=args.aot_dir)
    if args.export_aot:
        report = sampler.export_aot(args.export_aot)
        print(json.dumps({"exported_aot": report}), flush=True)
        return
    server = Server(sampler, cfg.pianotree, args.max_windows, cfg=cfg)
    print(json.dumps({"ready": True, "fixed_batch": args.fixed_batch,
                      "devices": jax.device_count() if mesh else 1,
                      "aot": sampler.aot_report}),
          flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        t0 = time.perf_counter()
        op = None
        try:
            req = json.loads(line)
            op = req.get("op") if isinstance(req, dict) else None
            if op == "quit":
                print(json.dumps({"ok": True, "bye": True}), flush=True)
                break
            resp = server.handle(req)
        except Exception as e:                      # serve loop must survive
            resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        ms = (time.perf_counter() - t0) * 1e3
        server.record(op, ms)
        resp["ms"] = round(ms, 1)
        print(json.dumps(resp), flush=True)


if __name__ == "__main__":
    main()
