"""Multi-host training launcher.

On Cloud TPU pods, `jax.distributed.initialize()` auto-detects the
coordinator, so each host just runs `python train.py --parallel` — this
launcher exists for explicit/manual topologies (e.g. CPU rehearsal, GKE with
custom env) and for single-machine multi-process rehearsal of the DCN path.

Modes:
  # explicit multi-host (run once per host, pids 0..N-1):
  python scripts/launch_distributed.py --coordinator host0:9876 \
      --num-processes 2 --process-id 0 -- --epochs 6 --parallel

  # local rehearsal: spawns N processes on THIS machine, each with
  # --local-devices forced CPU devices, and runs one hybrid-mesh step:
  python scripts/launch_distributed.py --rehearse 2 --local-devices 4

The training step itself is topology-agnostic: parallel.distributed builds a
(dcn_data, data) mesh from (process_count, local_device_count) and
parallel.mesh.make_parallel_train_step reduces over both axes.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rehearse(n_proc: int, local_devices: int) -> int:
    """Spawn n_proc local CPU processes and run one hybrid-mesh train step
    in each (the tests/distributed_worker.py harness)."""
    import socket

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={local_devices}"])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(n_proc), str(port)],
        env=env, cwd=repo) for pid in range(n_proc)]
    rcs = [p.wait() for p in procs]
    print(f"rehearsal: {n_proc} processes x {local_devices} devices, "
          f"rcs={rcs}")
    return max(rcs)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (omit on Cloud TPU "
                         "pods: auto-detected)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--rehearse", type=int, default=0, metavar="N",
                    help="spawn N local CPU processes and run one "
                         "hybrid-mesh step (smoke test, no training)")
    ap.add_argument("--local-devices", type=int, default=4,
                    help="forced CPU devices per rehearsal process")
    ap.add_argument("train_args", nargs="*",
                    help="arguments forwarded to train.py (after --)")
    args = ap.parse_args()

    if args.rehearse:
        sys.exit(rehearse(args.rehearse, args.local_devices))

    from pctd_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id)
    sys.argv = ["train.py"] + list(args.train_args)
    import importlib

    train = importlib.import_module("train")
    train.main()


if __name__ == "__main__":
    main()
