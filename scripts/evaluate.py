"""Evaluate reconstruction NLL / ELBO terms of a checkpoint on a validation
corpus (the parity measurement BASELINE.md calls for: final train/val recon
NLL under the canonical config).

Usage:
    python scripts/evaluate.py --checkpoint result_*/models/disvae_final
    python scripts/evaluate.py            # fresh model, synthetic corpus
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--variant", choices=["conv", "pianotree"],
                    default="conv")
    ap.add_argument("--data-path",
                    default="data/POP09-PIANOROLL-4-bin-quantization")
    ap.add_argument("--midi-dir", default=None,
                    help="evaluate on a corpus ingested from raw MIDI files")
    ap.add_argument("--synthetic-songs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=3345)
    ap.add_argument("--deterministic", action="store_true",
                    help="use posterior means instead of sampling")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import DataConfig, ModelConfig, TrainConfig
    from pctd_tpu.data.loaders import make_loaders
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.train.trainer import batch_features, init_state
    from pctd_tpu.train.checkpoint import restore_state

    mcfg = ModelConfig(txt_encoder=args.variant)
    tcfg = TrainConfig(batch_size=args.batch_size, seed=args.seed)
    dcfg = DataConfig(data_path=args.data_path, seed=args.seed)

    if args.midi_dir:
        from pctd_tpu.data.ingest import ingest_directory
        _, val_c = ingest_directory(args.midi_dir, dcfg)
    elif os.path.isdir(args.data_path):
        from pctd_tpu.data.corpus import prepare_dataset
        _, val_c = prepare_dataset(dcfg)
    else:
        from pctd_tpu.data.synthetic import synthetic_corpora
        _, val_c = synthetic_corpora(n_songs=args.synthetic_songs,
                                     seed=args.seed, cfg=dcfg)

    state, _ = init_state(jax.random.PRNGKey(args.seed), mcfg, tcfg)
    if args.checkpoint:
        state = restore_state(args.checkpoint, state)
        print(f"loaded {args.checkpoint} (step {int(state.step)})")

    _, vl = make_loaders(val_c, val_c, args.batch_size, seed=args.seed)

    @jax.jit
    def eval_metrics(params, key, pr, chord, shift):
        x, c, pr_mat, dt_x = batch_features(pr, chord, shift, mcfg)
        _, metrics = dv.loss(params, mcfg, key, x, c, pr_mat, dt_x,
                             tfr1=0.0, tfr2=0.0, tfr3=0.0, beta=0.1,
                             sample=not args.deterministic)
        return metrics

    acc, n = {}, 0
    for i, batch in enumerate(vl.epoch()):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed ^ 0xE7A1), i)
        m = eval_metrics(state.params, key, jnp.asarray(batch["pr"]),
                         jnp.asarray(batch["chord"]),
                         jnp.asarray(batch["shift"]))
        for k, v in m.items():
            acc[k] = acc.get(k, 0.0) + float(v)
        n += 1
    result = {k: v / max(n, 1) for k, v in acc.items()}
    result["num_batches"] = n
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
