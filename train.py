"""Train the chord/texture-disentangled VAE (TPU-native).

Capability of the reference train.py, with an actual CLI instead of
module-level constants (reference train.py:18-26). Defaults reproduce the
canonical configuration: conv texture encoder (the runnable
DisentangleVAE.init_model config, reference model.py:244-265); pass
``--variant pianotree`` for the train.py:32 "nozoth" configuration.

With no POP909 npz corpus on disk a synthetic corpus is generated so the
pipeline runs end to end out of the box.

Examples:
    python train.py --epochs 6 --batch-size 128
    python train.py --variant pianotree --synthetic-songs 40
    python train.py --parallel            # data-parallel over all devices
"""
from __future__ import annotations

import argparse

import json
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--beta", type=float, default=0.1)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=3345)
    ap.add_argument("--variant", choices=["conv", "pianotree"],
                    default="conv")
    ap.add_argument("--name", default="disvae")
    ap.add_argument("--data-path",
                    default="data/POP09-PIANOROLL-4-bin-quantization")
    ap.add_argument("--midi-dir", default=None,
                    help="build the corpus by ingesting raw MIDI files "
                         "under this directory (pctd_tpu.data.ingest)")
    ap.add_argument("--corpus-cache", default=None, metavar="PREFIX",
                    help="cache the ingested corpus at PREFIX.{train,val}.npz")
    ap.add_argument("--synthetic-songs", type=int, default=40,
                    help="synthetic corpus size when no npz data exists")
    ap.add_argument("--sched-horizon", type=float, default=1.0)
    ap.add_argument("--log-every", type=int, default=16,
                    help="write per-batch metrics every N train steps "
                         "(epoch averages stay exact on device regardless; "
                         "N=1 restores the reference's per-batch writes at "
                         "~9%% step cost from the host sync)")
    ap.add_argument("--eval-fixed-schedule", action="store_true",
                    help="evaluate at the schedules' final tfr/beta values "
                         "(schedule-invariant val loss / best-checkpoint "
                         "selection) instead of the current schedule position")
    ap.add_argument("--parallel", action="store_true",
                    help="data-parallel over all visible devices")
    ap.add_argument("--result-dir", default=".")
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize per-frame decoder activations "
                         "(enables batch >= 1024 on a 16G chip)")
    ap.add_argument("--accum-steps", type=int, default=0,
                    help="gradient-accumulation microbatches per step "
                         "(0 = auto: engage when the batch exceeds the "
                         "chip's measured HBM envelope)")
    ap.add_argument("--frame-kernel", action="store_true",
                    help="decode with the fused train-frame Pallas kernel "
                         "(hand-written VJP; fastest on TPU, ~16%% over "
                         "the XLA scans at large batch)")
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="capture a jax.profiler trace of N early steps")
    ap.add_argument("--aot-dir", default="auto", metavar="DIR",
                    help="preload committed AOT train executables "
                         "(scripts/export_aot.py) — skips the multi-minute "
                         "first compile when the config matches a bundle. "
                         "Default 'auto' = repo aot_bundles/ (or "
                         "$PCTD_AOT_DIR) when present; 'none' disables")
    args = ap.parse_args()

    import jax


    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import DataConfig, ModelConfig, TrainConfig
    from pctd_tpu.data.loaders import make_loaders
    from pctd_tpu.models.disentangle_vae import METRIC_NAMES
    from pctd_tpu.train.logging import MetricWriters, RunPaths
    from pctd_tpu.train.trainer import Trainer

    mcfg = ModelConfig(txt_encoder=args.variant,
                       compute_dtype=args.compute_dtype,
                       remat_frames=args.remat,
                       train_frame_kernel=args.frame_kernel)
    tcfg = TrainConfig(batch_size=args.batch_size, n_epoch=args.epochs,
                       lr=args.lr, beta=args.beta, clip_norm=args.clip,
                       seed=args.seed, sched_horizon=args.sched_horizon,
                       eval_fixed_schedule=args.eval_fixed_schedule,
                       accum_steps=args.accum_steps)
    dcfg = DataConfig(data_path=args.data_path, seed=args.seed)

    if args.midi_dir:
        from pctd_tpu.data.ingest import ingest_directory
        train_c, val_c = ingest_directory(args.midi_dir, dcfg,
                                          cache=args.corpus_cache)
        print(f"corpus: {len(train_c)} train / {len(val_c)} val segments "
              f"(ingested MIDI at {args.midi_dir})")
    elif os.path.isdir(args.data_path):
        from pctd_tpu.data.corpus import prepare_dataset
        train_c, val_c = prepare_dataset(dcfg)
        print(f"corpus: {len(train_c)} train / {len(val_c)} val segments "
              f"(npz at {args.data_path})")
    else:
        from pctd_tpu.data.synthetic import synthetic_corpora
        train_c, val_c = synthetic_corpora(n_songs=args.synthetic_songs,
                                           seed=args.seed, cfg=dcfg)
        print(f"corpus: {len(train_c)} train / {len(val_c)} val segments "
              f"(synthetic, {args.synthetic_songs} songs)")

    tl, vl = make_loaders(train_c, val_c, args.batch_size,
                          dcfg.shift_low, dcfg.shift_high, seed=args.seed)
    paths = RunPaths(readme_fn=__file__, base_dir=args.result_dir)
    writers = MetricWriters(METRIC_NAMES, paths.writer_path)

    if args.aot_dir == "auto":
        from pctd_tpu.train.aot_steps import default_aot_dir
        aot_dir = default_aot_dir()
    elif args.aot_dir in ("none", ""):
        aot_dir = None
    else:
        aot_dir = args.aot_dir

    trainer = Trainer(mcfg, tcfg, tl, vl, name=args.name, run_paths=paths,
                      writers=writers, log_every=args.log_every,
                      profile_steps=(2, 2 + args.profile) if args.profile
                      else None, aot_dir=aot_dir)

    if args.parallel and jax.device_count() > 1:
        from pctd_tpu.parallel import (make_mesh, make_parallel_train_step,
                                       replicate)
        mesh = make_mesh()
        trainer.state = replicate(mesh, trainer.state)
        base_step = make_parallel_train_step(mcfg, tcfg, trainer.tx, mesh)
        from pctd_tpu.parallel import shard_batch

        def sharded_step(state, pr, chord, shift):
            pr, chord, shift = shard_batch(mesh, pr, chord, shift)
            return base_step(state, pr, chord, shift)

        trainer.train_step = sharded_step
        print(f"data-parallel over {jax.device_count()} devices")

    print(f"devices: {jax.devices()}")
    result = trainer.run()
    with open(os.path.join(paths.log_path, "final_metrics.json"), "w") as f:
        json.dump(result, f, indent=2)
    print("Model saved.")


if __name__ == "__main__":
    main()
