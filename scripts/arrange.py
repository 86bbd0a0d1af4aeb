"""Accompaniment arrangement: given a piece's melody + chords + the first
bars of accompaniment, generate the rest of the accompaniment.

This is the reference's third demo workflow (demo/readme.txt: "In all
arrangement examples, the whole melody, the whole chord progression, and the
first two/four bars of the accompaniment are given") — its generation code
lives in the unpublished companion repo; here it is a CLI over the ingestion
front-end and the latent-control API.

Per 2-bar window: z_chd = chord-encoder posterior of that window's chords
(ground truth, from the file or --chords); z_txt = texture posterior of the
GIVEN opening accompaniment windows, held (or cycled) for the rest.

Usage:
    python scripts/arrange.py input.mid --checkpoint ckpt --out arranged.mid
    python scripts/arrange.py input.mid --given-bars 4 --chords "C-Am-F-G"
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help="source MIDI (melody track used if named "
                                  "'melody'; accompaniment = the rest)")
    ap.add_argument("--out", default="arranged.mid")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--given-bars", type=int, default=2,
                    help="opening accompaniment bars whose texture is kept")
    ap.add_argument("--cycle-texture", action="store_true",
                    help="cycle the given windows' textures instead of "
                         "holding the last one")
    ap.add_argument("--chords", default=None,
                    help="override the estimated chords with a progression")
    ap.add_argument("--bpm", type=float, default=0.0,
                    help="0 = keep the input file's tempo")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.data import demo as dm
    from pctd_tpu.data.converter import batch_expand_chord
    from pctd_tpu.data.songs import midi_to_windows
    from pctd_tpu.data.tensorize import tensorize_batch
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.models.disentangle_vae import DisentangleVAE

    cfg = ModelConfig()
    spec = cfg.pianotree
    if args.checkpoint:
        model = DisentangleVAE.from_train_checkpoint(args.checkpoint, cfg)
        print(f"loaded {args.checkpoint}")
    else:
        model = DisentangleVAE.init_model(jax.random.PRNGKey(args.seed), cfg)
        print("WARNING: no checkpoint — untrained model")

    try:
        pr, mel, chord, file_bpm = midi_to_windows(args.input)
    except ValueError as e:
        raise SystemExit(str(e))
    bpm = args.bpm or file_bpm
    n_win = len(pr)

    if args.chords:
        from pctd_tpu.data.chords import (progression_to_chord_table,
                                          split_progression)
        table = progression_to_chord_table(
            split_progression(args.chords), n_win * cfg.chord.num_step)
        chord = table.reshape(n_win, cfg.chord.num_step, 14)

    c = jnp.asarray(batch_expand_chord(chord, np.zeros(n_win)))
    z_chd = dv.encode_chord(model.params, cfg, c).mean

    # texture latents from the GIVEN opening windows
    n_given = max(1, args.given_bars // 2)
    feats = tensorize_batch(jnp.asarray(pr[:n_given]),
                            jnp.asarray(chord[:n_given]),
                            jnp.zeros(n_given, jnp.int32), spec=spec,
                            with_detrend=False)
    _, dist_rhy = dv.encode(model.params, cfg, feats["pr_mat"], feats["c"])
    z_given = np.asarray(dist_rhy.mean)
    if args.cycle_texture:
        z_rhy = z_given[np.arange(n_win) % n_given]
    else:
        idx = np.minimum(np.arange(n_win), n_given - 1)
        z_rhy = z_given[idx]

    from pctd_tpu.utils import host
    grids = host.fetch_np(
        dv.decode_z(model.params, cfg, z_chd, jnp.asarray(z_rhy)))
    acc_segments = [dm.grid_to_pr_and_notes(g, bpm=bpm,
                                            spec=spec)[1] for g in grids]
    # the given opening windows keep their ORIGINAL accompaniment
    from pctd_tpu.data.converter import pr_to_onehot_pr, piano_roll_to_target

    for i in range(n_given):
        dur = piano_roll_to_target(pr_to_onehot_pr(pr[i].astype(int)))
        acc_segments[i] = dm.pr_matrix_to_notes(dur, bpm=bpm)

    mel_segments = [dm.mel_pr_to_notes(m, bpm=bpm) for m in mel]
    tracks = [mel_segments, acc_segments]
    names = ["melody", "arranged_acc"]
    dm.write_demo(args.out, tracks, names, bpm=bpm, shift_beat=8)
    n_notes = sum(len(s) for s in acc_segments if s)
    print(f"wrote {args.out}: {n_win} windows ({n_given} given), "
          f"{n_notes} accompaniment notes, bpm {bpm:.0f}")


if __name__ == "__main__":
    main()
