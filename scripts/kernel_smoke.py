"""CLI: AOT compile-smoke every Pallas kernel entry on the current device.

Catches Mosaic lowering regressions (layout/alignment/VMEM) that
interpret-mode parity tests cannot see, over the realistic batch matrix.
Exit code 0 iff every (kernel, batch) combo compiles. Uses the persistent
compilation cache, so re-runs cost seconds.

    python scripts/kernel_smoke.py            # full matrix
    python scripts/kernel_smoke.py --quick    # serving kernels at B=128,512
    python scripts/kernel_smoke.py --only serve_pallas_full
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="serving kernels only, B in {128, 512}")
    ap.add_argument("--only", nargs="*", default=None,
                    help="label prefixes/substrings to keep")
    ap.add_argument("--serve-batches", type=int, nargs="*", default=None)
    ap.add_argument("--train-batches", type=int, nargs="*", default=None)
    ap.add_argument("--extended", action="store_true",
                    help="also gate the non-default programs (nofuse "
                         "fallback, kernel eval primal)")
    args = ap.parse_args()

    from pctd_tpu.ops.pallas import smoke

    serve = args.serve_batches
    train = args.train_batches
    if args.quick:
        serve = serve if serve is not None else (128, 512)
        train = train if train is not None else ()
    results, ok = smoke.run_gate(
        serve_batches=serve if serve is not None else smoke.SERVE_BATCHES,
        train_batches=train if train is not None else smoke.TRAIN_BATCHES,
        which=args.only, extended=args.extended)
    for label, r in results.items():
        line = f"{label}: {'ok' if r['ok'] else 'FAIL'} ({r['seconds']}s)"
        if not r["ok"]:
            line += f" {r['error']}"
        print(line, file=sys.stderr, flush=True)
    print(json.dumps({"ok": ok, "results": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
