"""Generate the four controllable-generation demo workflows as MIDI files,
mirroring the structure of the reference's demo/ tree (demo/readme.txt):

1_compositional_style_transfer/   k x k recombination of z_chd / z_txt
2_texture_variation/              posterior + prior sampling
3_acc_arrangement/                melody-conditioned accompaniment windows
chord_prog_interpolation/         latent SLERP over the chord code

Usage:
    python scripts/make_demos.py --checkpoint result_*/models/disvae_final \
        [--out demo_out] [--songs 8]

Without --checkpoint an untrained model is used (structure smoke-run).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--k", type=int, default=4,
                    help="k x k style-transfer grid size")
    ap.add_argument("--bpm", type=float, default=90.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model dims (CI smoke run, untrained)")
    ap.add_argument("--midi-dir", default=None,
                    help="source segments from a corpus ingested from raw "
                         "MIDI files instead of the synthetic corpus")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import DataConfig, ModelConfig
    from pctd_tpu.data import demo as dm
    from pctd_tpu.data.synthetic import synthetic_corpora
    from pctd_tpu.data.tensorize import tensorize_batch
    from pctd_tpu.models.disentangle_vae import DisentangleVAE
    from pctd_tpu.models import disentangle_vae as dv

    if args.tiny:
        cfg = dataclasses.replace(
            ModelConfig(), chd_z_dim=8, txt_z_dim=8, chd_enc_hidden=12,
            txt_emb_size=12, txt_enc_hidden=12, chd_dec_hidden=12,
            chd_dec_z_in=8, note_emb_size=12, dec_emb_hidden=8,
            dec_time_hidden=16, dec_notes_hidden=12, dec_z_in=8,
            dec_dur_hidden=8)
    else:
        cfg = ModelConfig()
    spec = cfg.pianotree
    if args.checkpoint:
        model = DisentangleVAE.from_train_checkpoint(args.checkpoint, cfg)
        print(f"loaded {args.checkpoint}")
    else:
        model = DisentangleVAE.init_model(jax.random.PRNGKey(args.seed), cfg)
        print("WARNING: no checkpoint — untrained model (structure run)")

    dcfg = dataclasses.replace(DataConfig(), portion=4)
    if args.midi_dir:
        from pctd_tpu.data.ingest import ingest_directory
        train_c, _ = ingest_directory(args.midi_dir, dcfg)
    else:
        train_c, _ = synthetic_corpora(n_songs=max(8, args.k * 2),
                                       seed=args.seed, cfg=dcfg)
    k = args.k
    idx = np.linspace(0, len(train_c) - 1, k).astype(int)
    feats = tensorize_batch(jnp.asarray(train_c.pr[idx]),
                            jnp.asarray(train_c.chord[idx]),
                            jnp.zeros(k, jnp.int32), spec=spec,
                            with_detrend=False)
    pr_mat, c = feats["pr_mat"], feats["c"]
    shift_beat = spec.num_step / 4 * 4  # 8 beats per 2-bar segment... in 16ths

    os.makedirs(args.out, exist_ok=True)

    def grid_notes(grid):
        _, notes = dm.grid_to_pr_and_notes(np.asarray(grid), bpm=args.bpm,
                                           spec=spec)
        return notes

    # -- 1: compositional style transfer (k x k latent recombination) --------
    d1 = os.path.join(args.out, "1_compositional_style_transfer")
    os.makedirs(d1, exist_ok=True)
    dist_chd, dist_rhy = dv.encode(model.params, cfg, pr_mat, c)
    z_chd, z_rhy = dist_chd.mean, dist_rhy.mean
    # batch the whole k^2 grid through one decode
    zc = jnp.repeat(z_chd, k, axis=0)                 # row-major (chd i, txt j)
    zr = jnp.tile(z_rhy, (k, 1))
    grids = dv.decode_z(model.params, cfg, zc, zr)
    all_tracks = []
    for i in range(k):
        for j in range(k):
            notes = grid_notes(grids[i * k + j])
            dm.write_demo(os.path.join(d1, f"swap_{i}_{j}.mid"),
                          [[notes]], [f"chd{i}_txt{j}"], bpm=args.bpm,
                          shift_beat=8)
            all_tracks.append([notes])
    dm.write_demo(os.path.join(d1, "swap_all.mid"), all_tracks,
                  [f"swap_{i}_{j}" for i in range(k) for j in range(k)],
                  bpm=args.bpm, shift_beat=8)

    # -- 1b: 16-bar whole-song style transfer (reference demo
    # 1_compositional_style_transfer/16bar_style_transfer: 'all.mid' holds
    # all four scores: A, B, A-chords+B-texture, B-chords+A-texture) --------
    from pctd_tpu.data.songs import SongDataset

    songs = SongDataset(train_c, min_bars=12)
    if len(songs) >= 2:
        d1b = os.path.join(d1, "16bar_style_transfer")
        os.makedirs(d1b, exist_ok=True)
        n_win = 8  # 8 windows x 2 bars = 16 bars
        length = min(2 * n_win, min(songs.song_len[0], songs.song_len[1]))
        ba = songs.get_song_batch(0, length=length)
        bb = songs.get_song_batch(1, length=length)
        fa = tensorize_batch(jnp.asarray(ba["pr"]), jnp.asarray(ba["chord"]),
                             jnp.asarray(ba["shift"]), spec=spec,
                             with_detrend=False)
        fb = tensorize_batch(jnp.asarray(bb["pr"]), jnp.asarray(bb["chord"]),
                             jnp.asarray(bb["shift"]), spec=spec,
                             with_detrend=False)
        da_chd, da_rhy = dv.encode(model.params, cfg, fa["pr_mat"], fa["c"])
        db_chd, db_rhy = dv.encode(model.params, cfg, fb["pr_mat"], fb["c"])
        versions = {
            "A_original": (da_chd.mean, da_rhy.mean),
            "B_original": (db_chd.mean, db_rhy.mean),
            "Achd_Btxt": (da_chd.mean, db_rhy.mean),
            "Bchd_Atxt": (db_chd.mean, da_rhy.mean),
        }
        tracks, names = [], []
        for name, (zc, zr) in versions.items():
            grids = dv.decode_z(model.params, cfg, zc, zr)
            tracks.append([grid_notes(g) for g in grids])
            names.append(name)
        dm.write_demo(os.path.join(d1b, "all.mid"), tracks, names,
                      bpm=args.bpm, shift_beat=8)

    # -- 2: texture variation (posterior + prior sampling) -------------------
    d2p = os.path.join(args.out, "2_texture_variation", "posterior_sampling")
    d2q = os.path.join(args.out, "2_texture_variation", "prior_sampling")
    os.makedirs(d2p, exist_ok=True)
    os.makedirs(d2q, exist_ok=True)
    orig_notes = grid_notes(dv.decode_z(model.params, cfg, z_chd[:1],
                                        z_rhy[:1])[0])
    dm.write_demo(os.path.join(d2p, "original.mid"), [[orig_notes]],
                  ["original"], bpm=args.bpm, shift_beat=8)
    for s in range(3):
        est = dv.posterior_sample(model.params, cfg,
                                  jax.random.PRNGKey(100 + s),
                                  pr_mat[:1], c[:1], scale=1.0,
                                  sample_chd=False, sample_txt=True)
        dm.write_demo(os.path.join(d2p, f"post_sample_{s}.mid"),
                      [[grid_notes(est[0])]], ["posterior"], bpm=args.bpm,
                      shift_beat=8)
    for s in range(2):
        est = dv.prior_sample(model.params, cfg, jax.random.PRNGKey(200 + s),
                              pr_mat[:1], c[:1], sample_rhy=True)
        dm.write_demo(os.path.join(d2q, f"prior_sample_{s}.mid"),
                      [[grid_notes(est[0])]], ["prior"], bpm=args.bpm,
                      shift_beat=8)

    # -- 3: accompaniment arrangement (windowed texture re-use) --------------
    d3 = os.path.join(args.out, "3_acc_arrangement")
    os.makedirs(d3, exist_ok=True)
    # given the chords of segment 1..k-1 and the texture of segment 0,
    # arrange accompaniment for the whole sequence (window-wise decode)
    zc_seq = z_chd                                     # chords per window
    zr_seq = jnp.repeat(z_rhy[:1], k, axis=0)          # donor texture
    grids3 = dv.decode_z(model.params, cfg, zc_seq, zr_seq)
    segs = [grid_notes(grids3[i]) for i in range(k)]
    mel_segs = [dm.mel_pr_to_notes(train_c.mel[int(ix)], bpm=args.bpm)
                for ix in idx]
    dm.write_demo(os.path.join(d3, "arrangement_given_texture.mid"),
                  [mel_segs, segs], ["melody", "arranged_acc"],
                  bpm=args.bpm, shift_beat=8)

    # -- 4: chord progression interpolation ----------------------------------
    d4 = os.path.join(args.out, "chord_prog_interpolation")
    os.makedirs(d4, exist_ok=True)
    est = dv.interp(model.params, cfg, pr_mat[:1], c[:1], pr_mat[1:2],
                    c[1:2], interp_chd=True, int_count=6)
    segs = [grid_notes(est[0, i]) for i in range(6)]
    dm.write_demo(os.path.join(d4, "interp_chd.mid"), [segs],
                  ["chord_interp"], bpm=args.bpm, shift_beat=8)

    n_files = sum(len(fs) for _, _, fs in os.walk(args.out))
    print(f"wrote {n_files} MIDI files under {args.out}/")


if __name__ == "__main__":
    main()
