"""Render the published performance tables from a canonical bench artifact.

Every number in README.md's "Measured performance" table (and the bench
summary block in ARCHITECTURE.md) lives between BENCH:BEGIN/BENCH:END
markers and is REGENERATED from a bench.py JSON artifact by this script —
one command reproduces every published number, so docs can never disagree
with the committed measurement (round-1 verdict: README claimed ~2200 seg/s
sample decode while the bench artifact said ~1150).

Usage:
    python bench.py > bench_results.json              # measure (on TPU)
    python scripts/report_bench.py bench_results.json # rewrite doc tables
    python scripts/report_bench.py bench_results.json --check   # verify only
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"


def load_bench(path: str) -> dict:
    """Accept either bench.py's raw JSON line or a driver BENCH_r*.json
    wrapper (which carries the line under 'parsed' / 'tail')."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "metric" not in d:
        raise SystemExit(f"{path}: not a bench artifact (no 'metric' key)")
    return d


def fmt(x, nd=0):
    if x is None:
        return "—"
    return f"{x:,.{nd}f}"


def _get(d, *keys):
    """Nested get that returns None on any missing/None hop — bench.py's
    budget watchdog may have skipped any non-headline section, so every
    row must tolerate absent data (the artifact degrades, docs follow)."""
    for k in keys:
        if not isinstance(d, dict) or d.get(k) is None:
            return None
        d = d[k]
    return d


def render_readme_table(b: dict, baseline: dict) -> str:
    e = b["extra"]
    ref_rate = (baseline or {}).get("train_step", {}).get("segments_per_sec")
    ref_tens = (baseline or {}).get("tensorization",
                                    {}).get("segments_per_sec")

    def speed(v):
        return f"{v / ref_rate:,.0f}×" if ref_rate else "—"

    big = e.get("throughput_config")
    mfu = e.get("mfu_bf16_analytic_matmul")
    kernel_note = e.get("throughput_config_note",
                        "fused train-frame Pallas kernel (hand-written VJP)")
    alts = e.get("train_b2048_bf16_alt_kernels") or (
        [e["train_b2048_bf16_alt_kernel"]]
        if e.get("train_b2048_bf16_alt_kernel") else [])
    xla = _get(e, "train_b2048_bf16_xla_scans", "segments_per_sec")
    b4096 = _get(e, "train_b4096_bf16_kernel_auto_accum", "segments_per_sec")
    b128k = _get(e, "train_b128_bf16_frame_kernel", "segments_per_sec")
    b128 = _get(e, "train_b128_bf16", "segments_per_sec")
    b128f = _get(e, "train_b128_f32", "segments_per_sec")
    tens = e.get("tensorize_segments_per_sec")
    rows = [
        (f"train step, bs=2048 bf16, {kernel_note}",
         f"{fmt(ref_rate, 2)} seg/s",
         f"{fmt(big['segments_per_sec'])} seg/s"
         + (f" ({mfu * 100:.0f}% MFU)" if mfu else ""),
         speed(big["segments_per_sec"])) if big else None,
        *[(f"train step, bs=2048 bf16, {alt['which']}",
           f"{fmt(ref_rate, 2)} seg/s",
           f"{fmt(alt['segments_per_sec'])} seg/s",
           speed(alt["segments_per_sec"])) for alt in alts],
        ("train step, bs=2048 bf16, XLA scans + frame remat",
         f"{fmt(ref_rate, 2)} seg/s", f"{fmt(xla)} seg/s", speed(xla))
        if xla else None,
        ("train step, bs=4096 bf16 (auto grad accumulation ×2)",
         f"{fmt(ref_rate, 2)} seg/s", f"{fmt(b4096)} seg/s", speed(b4096))
        if b4096 else None,
        ("train step, canonical config, bs=128",
         f"{fmt(ref_rate, 2)} seg/s",
         f"{fmt(b128k)} (bf16 + kernel) / {fmt(b128)} (bf16) / "
         f"{fmt(b128f)} (f32) seg/s",
         speed(b128k)) if b128k and b128 and b128f else None,
        ("tensorization (full pipeline)",
         f"{fmt(ref_tens)} /s",
         f"{fmt(tens)} /s on device",
         f"{tens / ref_tens:,.0f}×" if ref_tens else "—")
        if tens else None,
    ]
    # one row per batch size; compare backends only within a batch size
    # (bench.py emits several backends at the reference bs=128 plus
    # scaling points at other batch sizes — ms across batches isn't
    # comparable)
    by_bs = {}
    for d in e.get("sample_decode") or []:
        by_bs.setdefault(d["batch_size"], []).append(d)
    worst_decode_spread = 0.0
    for bs in sorted(by_bs):
        group = sorted(by_bs[bs], key=lambda d: d["ms_per_batch"])
        best = group[0]
        worst_decode_spread = max(worst_decode_spread,
                                  *(d.get("rel_spread") or 0 for d in group))
        detail = " / ".join(
            f"{d['ms_per_batch']:.1f} ms ({d['backend']})" for d in group)
        rows.append(
            (f"AR sampling decode, bs={bs}",
             "—",
             f"{fmt(best['segments_per_sec'])} seg/s — {detail}",
             "—"))
    serve = e.get("serve_workflows")
    if serve:
        ops = [k for k in ("style_transfer", "variation", "prior", "interp")
               if isinstance(serve.get(k), dict)]
        if ops:
            detail = " / ".join(f"{serve[op]['p50_ms']:.0f} ms ({op})"
                                for op in ops)
            rows.append(
                (f"serving daemon, end-to-end MIDI→MIDI p50 "
                 f"(fixed_batch={serve.get('fixed_batch')}, "
                 f"{serve.get('backend')})",
                 "—", detail, "—"))
        aot = serve.get("aot") or {}
        freshp = aot.get("fresh_process") or {}
        if freshp.get("process_to_first_response_s") is not None:
            warm = aot.get("cold_start_warm_process_s")
            rows.append(
                ("serving daemon cold start, FRESH PROCESS + committed AOT "
                 "bundles: interpreter + jax client + preload + first "
                 "response (vs ~2-10 min of compiles without)",
                 "—",
                 f"{freshp['process_to_first_response_s']:.1f} s "
                 f"({freshp['loaded']} programs preloaded; bundle preload "
                 f"itself {freshp.get('preload_s', 0):.1f} s"
                 + (f", warm-client preload+request {warm:.1f} s"
                    if warm is not None else "") + ")",
                 "—"))
        elif aot.get("cold_start_warm_process_s") is not None:
            rows.append(
                ("serving daemon cold start (warm-process preload + first "
                 "request; excludes interpreter/client startup)",
                 "—",
                 f"{aot['cold_start_warm_process_s']:.1f} s to first "
                 f"response ({aot['loaded']} programs preloaded)",
                 "—"))
    lines = ["| metric | reference (torch, host CPU) | pctd_tpu | speedup |",
             "|---|---|---|---|"]
    for r in rows:
        if r is not None:
            lines.append("| " + " | ".join(r) + " |")
    timing = e.get("timing", {})
    skipped = _get(e, "budget", "skipped_for_budget")
    max_spread = timing.get("max_rel_spread") or 0
    if max_spread > 1.5:      # pre-round-4 artifacts stored percent
        max_spread /= 100.0
    note = (f"\n(Table generated by `scripts/report_bench.py` from the bench "
            f"artifact — {timing.get('method', 'single run')}; max section "
            f"spread {max_spread * 100:.1f}%"
            + (f", worst decode-row spread {worst_decode_spread * 100:.1f}%"
               if by_bs else "")
            + (", CONTENDED RUN" if timing.get("contended") else "")
            + (f"; sections skipped for wall-clock budget: "
               f"{', '.join(skipped)}" if skipped else "")
            + f". Device: {e.get('device', '?')}.)")
    return "\n".join(lines) + note


def render_arch_block(b: dict) -> str:
    e = b["extra"]
    big = e.get("throughput_config") or {}
    lines = ["```"]
    if b.get("value") is not None:
        lines.append(f"headline : {b['value']:,.0f} seg/s/chip  "
                     f"({b['unit']})")
    if big.get("step_seconds") is not None:
        step = f"step     : {big['step_seconds'] * 1e3:.1f} ms"
        if big.get("step_seconds_hostsync") is not None:
            step += f" (hostsync {big['step_seconds_hostsync'] * 1e3:.1f} ms)"
        lines.append(step)
    if e.get("mfu_bf16_analytic_matmul") is not None:
        lines.append(f"MFU      : {e['mfu_bf16_analytic_matmul'] * 100:.1f}%"
                     " (analytic matmul FLOPs vs bf16 peak)")
    if e.get("tensorize_segments_per_sec") is not None:
        lines.append(f"tensorize: {e['tensorize_segments_per_sec']:,.0f} "
                     "seg/s")
    for d in e.get("sample_decode") or []:
        lines.append(f"decode   : {d['backend']:<12s} B={d['batch_size']} "
                     f"{d['ms_per_batch']:.1f} ms/batch "
                     f"({d['segments_per_sec']:,.0f} seg/s, "
                     f"spread {(d.get('rel_spread') or 0) * 100:.0f}%)")
    serve = e.get("serve_workflows") or {}
    for op in ("style_transfer", "variation", "prior", "interp"):
        if isinstance(serve.get(op), dict):
            lines.append(f"serve    : {op:<14s} p50 "
                         f"{serve[op]['p50_ms']:.0f} ms end-to-end "
                         f"({serve[op]['windows']} windows)")
    aot = serve.get("aot") or {}
    freshp = aot.get("fresh_process") or {}
    if freshp.get("process_to_first_response_s") is not None:
        lines.append("serve    : fresh-process cold start "
                     f"{freshp['process_to_first_response_s']:.1f} s from "
                     f"committed AOT bundles ({freshp['loaded']} programs)")
    elif aot.get("cold_start_warm_process_s") is not None:
        lines.append("serve    : warm-process cold start "
                     f"{aot['cold_start_warm_process_s']:.1f} s "
                     f"from committed AOT bundles ({aot['loaded']} programs)")
    aot_cov = _get(e, "budget", "aot_covered_sections")
    for label, secs in sorted((e.get("compile_seconds") or {}).items()):
        via_aot = aot_cov and label in aot_cov
        lines.append(f"compile  : {label:<28s} {secs:.0f} s (first call"
                     + (", AOT-preloaded" if via_aot else "") + ")")
    lines.append("```")
    return "\n".join(lines)


def splice(path: str, block: str, check: bool) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        raise SystemExit(f"{path}: no {BEGIN} ... {END} markers")
    new = pat.sub(BEGIN + "\n" + block + "\n" + END, text)
    if check:
        return new == text
    if new != text:
        with open(path, "w") as f:
            f.write(new)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="bench.py JSON output (or BENCH_r*.json)")
    ap.add_argument("--check", action="store_true",
                    help="verify the committed tables match; exit 1 if not")
    args = ap.parse_args()

    b = load_bench(args.bench)
    if b.get("value") is None:
        # a device-outage/fatal artifact has no headline — refuse to
        # overwrite the last good published tables with an empty one
        print("bench artifact has no headline (value null) — docs left "
              "untouched", file=sys.stderr)
        sys.exit(1)
    baseline = None
    bp = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        with open(bp) as f:
            baseline = json.load(f)

    ok = True
    ok &= splice(os.path.join(REPO, "README.md"),
                 render_readme_table(b, baseline), args.check)
    arch = os.path.join(REPO, "ARCHITECTURE.md")
    with open(arch) as f:
        if BEGIN in f.read():
            ok &= splice(arch, render_arch_block(b), args.check)
    if args.check and not ok:
        print("doc tables are stale vs the bench artifact", file=sys.stderr)
        sys.exit(1)
    print("doc tables " + ("verified" if args.check else "regenerated"))


if __name__ == "__main__":
    main()
