"""Generate music from a chord progression (the workflow behind the
reference's prior-sampling demos, e.g. demo/2_texture_variation/
prior_sampling/C-Am-F-G.mid — named by progression, code unpublished).

The chord progression drives z_chd through the chord encoder; the texture
latent comes from the prior, or from a donor MIDI's accompaniment
(compositional style transfer onto your chords).

Usage:
    python scripts/generate.py --chords "C-Am-F-G" --out cafg.mid \
        --checkpoint runs/result_*/models/*_valid
    python scripts/generate.py --chords "Am D7 G" --texture-from donor.mid \
        --bars 8 --samples 3 --out out.mid
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chords", required=True,
                    help="progression, e.g. 'C-Am-F-G' or 'Am D7 G'")
    ap.add_argument("--out", default="generated.mid")
    ap.add_argument("--checkpoint", default=None,
                    help="train checkpoint (untrained model if omitted)")
    ap.add_argument("--texture-from", default=None, metavar="MIDI",
                    help="donor MIDI whose accompaniment texture is reused "
                         "(default: sample the texture prior)")
    ap.add_argument("--bars", type=int, default=2,
                    help="length in bars (2-bar windows, chords repeat)")
    ap.add_argument("--samples", type=int, default=1,
                    help="number of variations (stacked as MIDI tracks)")
    ap.add_argument("--beats-per-chord", type=int, default=0,
                    help="0 = spread the progression over each 2-bar window")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="texture prior std scale")
    ap.add_argument("--bpm", type=float, default=80.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.data import demo as dm
    from pctd_tpu.data.chords import (progression_to_chord_table,
                                      split_progression)
    from pctd_tpu.data.converter import batch_expand_chord
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

    symbols = split_progression(args.chords)
    n_windows = max(1, args.bars // 2)
    beats_per_window = cfg.chord.num_step                    # 8 beats

    # chord table for the whole piece, then per-window slices
    total_beats = n_windows * beats_per_window
    table = progression_to_chord_table(
        symbols, total_beats,
        args.beats_per_chord or max(1, total_beats // len(symbols)))
    windows = table.reshape(n_windows, beats_per_window, 14)
    c = jnp.asarray(batch_expand_chord(windows, np.zeros(n_windows)))
    dist_chd = dv.encode_chord(model.params, cfg, c)

    # texture latent: donor MIDI posterior, or prior sample
    key = jax.random.PRNGKey(args.seed)
    tracks, names = [], []
    for s in range(args.samples):
        key, k1, k2 = jax.random.split(key, 3)
        if args.texture_from:
            from pctd_tpu.data.ingest import midi_to_musics
            from pctd_tpu.data.corpus import song_to_segments

            musics = midi_to_musics(args.texture_from, split_tracks=False)
            seg = song_to_segments(musics[0], 0)
            if seg is None or len(seg) == 0:
                raise SystemExit(f"{args.texture_from}: no valid 2-bar "
                                 "segments to take texture from")
            idx = np.linspace(0, len(seg) - 1, n_windows).astype(int)
            feats = tensorize_batch(jnp.asarray(seg.pr[idx]),
                                    jnp.asarray(seg.chord[idx]),
                                    jnp.zeros(n_windows, jnp.int32),
                                    spec=spec, with_detrend=False)
            _, dist_rhy = dv.encode(model.params, cfg, feats["pr_mat"],
                                    feats["c"])
            z_rhy = dist_rhy.rsample(k2) if args.samples > 1 \
                else dist_rhy.mean
        else:
            z_rhy = (jax.random.normal(k2, (n_windows, cfg.txt_z_dim))
                     * args.scale)
        z_chd = dist_chd.mean if args.texture_from or args.samples == 1 \
            else dist_chd.rsample(k1)
        from pctd_tpu.utils import host
        grids = host.fetch_np(dv.decode_z(model.params, cfg, z_chd, z_rhy))
        notes = [dm.grid_to_pr_and_notes(g, bpm=args.bpm,
                                         spec=spec)[1] for g in grids]
        tracks.append(notes)
        names.append(f"sample_{s}" if args.samples > 1 else "generated")

    dm.write_demo(args.out, tracks, names, bpm=args.bpm, shift_beat=8)
    total_notes = sum(len(n) for t in tracks for n in t)
    print(f"wrote {args.out}: {args.samples} track(s) x {args.bars} bars, "
          f"{total_notes} notes, progression {' '.join(symbols)}")


if __name__ == "__main__":
    main()
