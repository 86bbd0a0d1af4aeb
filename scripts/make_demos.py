"""Generate the four controllable-generation demo workflows as MIDI files,
mirroring the structure AND breadth of the reference's demo/ tree
(/root/reference/demo/readme.txt:5-33, ~73 golden MIDIs):

1_compositional_style_transfer/
    swap_{i}_{j}.mid (k x k latent recombination) + swap_all.mid
    more_examples/swap_{2k}by{2k}.mid       (larger grid, one multi-track file)
    16bar_style_transfer/{A_original,B_original,Achd_Btxt,Bchd_Atxt,all}.mid
    16bar_style_transfer/more_examples/sampleN/... (additional song pairs)
2_texture_variation/
    posterior_sampling/original.mid + post_sample_{0..2}.mid
    posterior_sampling/more_examples/sampleN/...   (additional originals)
    prior_sampling/C-Am-F-G.mid + more_examples/{Am-D7-G,G-F-Eb,F-Bb-F}.mid
3_acc_arrangement/
    fig_generation_given2bar.mid, arrangement_given_texture.mid
    more_examples/sampleN_given{2,4}bar.mid
    more_examples/long_generation/sampleN_given4bar.mid (iterative, >=16 bars)
chord_prog_interpolation/
    interp_chd.mid + named progression pairs, BOTH directions

All decodes run through a fixed-batch Sampler so the whole matrix reuses a
handful of compiled programs (shape discipline; a new shape costs minutes on
TPU).

Usage:
    python scripts/make_demos.py --checkpoint result_*/models/disvae_final \
        [--out demo_out] [--k 4] [--midi-dir DIR]

Without --checkpoint an untrained model is used (structure smoke-run).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# named progressions of the reference demo tree (prior_sampling file names +
# chord_prog_interpolation pairs, demo/readme.txt + file listing)
PRIOR_PROGRESSIONS = ["C-Am-F-G", "Am-D7-G", "G-F-Eb", "F-Bb-F"]
INTERP_PAIRS = [("C-Am-F-G", "Eb-Cm-Ab-Bb"), ("Am-Dm-G-C", "C-F-G-C"),
                ("Db-G-Cm", "C-D-G")]


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
    ap.add_argument("--aot-dir", default=None, metavar="DIR",
                    help="preload committed AOT serving executables "
                         "(aot_bundles; skips decode/encode compiles when "
                         "the runtime and fixed batch match a bundle)")
    ap.add_argument("--frame-decoder", default="auto",
                    choices=["auto", "xla", "pallas", "pallas_full"],
                    help="'auto' picks the fastest backend for the device "
                         "and degrades on kernel compile failure")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu'; the axon TPU "
                         "plugin ignores JAX_PLATFORMS from the environment)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import DataConfig, ModelConfig, tiny_model_config
    from pctd_tpu.data import demo as dm
    from pctd_tpu.data import tensorize as tz
    from pctd_tpu.data.chords import (progression_to_chord_table,
                                      split_progression)
    from pctd_tpu.data.converter import batch_expand_chord
    from pctd_tpu.data.songs import SongDataset
    from pctd_tpu.data.synthetic import synthetic_corpora
    from pctd_tpu.data.tensorize import tensorize_batch
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.models.disentangle_vae import DisentangleVAE
    from pctd_tpu.models.sampler import Sampler

    cfg = tiny_model_config() if args.tiny else ModelConfig()
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
    # ONE compiled decode program for the whole matrix (batches pad/chunk)
    # with committed bundles, serve at the bundle batch (128): 8x padded
    # decode compute per call but ZERO compiles — right trade for a demo
    # script. Only commit to the big batch if bundles actually PRELOAD
    # (wrong runtime / tiny config / stale sources all skip them — then a
    # B=128 program would mean a multi-minute compile AND 8x padded work,
    # strictly worse than the plain B=16 path).
    sampler = None
    if args.aot_dir:
        sampler = Sampler(model.params, cfg,
                          frame_decoder=args.frame_decoder,
                          fixed_batch=128, aot_dir=args.aot_dir)
        if not sampler.aot_report["loaded"]:
            print(f"no usable AOT bundles in {args.aot_dir} "
                  f"(skipped: {len(sampler.aot_report['skipped'])}) — "
                  "compiling at the small batch instead")
            sampler = None
    if sampler is None:
        sampler = Sampler(model.params, cfg,
                          frame_decoder=args.frame_decoder, fixed_batch=16)

    def pick_segments(n):
        """n segments from n distinct songs where possible (the reference's
        k pieces are different songs, readme.txt:14-19)."""
        sids = np.unique(train_c.song_id)
        if len(sids) >= n:
            idx = np.array([int(np.nonzero(train_c.song_id == s)[0][0])
                            for s in sids[:n]])
        else:
            idx = np.linspace(0, len(train_c) - 1, n).astype(int)
        return idx

    def feats_at(idx):
        f = tensorize_batch(jnp.asarray(train_c.pr[idx]),
                            jnp.asarray(train_c.chord[idx]),
                            jnp.zeros(len(idx), jnp.int32), spec=spec,
                            with_detrend=False)
        return f["pr_mat"], f["c"]

    idx = pick_segments(k)
    pr_mat, c = feats_at(idx)

    os.makedirs(args.out, exist_ok=True)

    def grid_notes(grid):
        _, notes = dm.grid_to_pr_and_notes(np.asarray(grid), bpm=args.bpm,
                                           spec=spec)
        return notes

    def write(path, tracks, names):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        dm.write_demo(path, tracks, names, bpm=args.bpm, shift_beat=8)

    def progression_chord(prog: str):
        """Chord symbols -> one 2-bar expanded chord window (1, 8, 36)."""
        table = progression_to_chord_table(
            split_progression(prog), cfg.chord.num_step,
            max(1, cfg.chord.num_step // len(split_progression(prog))))
        return jnp.asarray(batch_expand_chord(table[None], np.zeros(1)))

    # -- 1: compositional style transfer (k x k latent recombination) --------
    d1 = os.path.join(args.out, "1_compositional_style_transfer")
    dist_chd, dist_rhy = sampler.encode(pr_mat, c)
    z_chd, z_rhy = dist_chd.mean, dist_rhy.mean

    def swap_grid(zc_src, zr_src, n):
        zc = jnp.repeat(zc_src, n, axis=0)        # row-major (chd i, txt j)
        zr = jnp.tile(zr_src, (n, 1))
        return sampler.decode(zc, zr)

    grids = swap_grid(z_chd, z_rhy, k)
    all_tracks = []
    for i in range(k):
        for j in range(k):
            notes = grid_notes(grids[i * k + j])
            write(os.path.join(d1, f"swap_{i}_{j}.mid"), [[notes]],
                  [f"chd{i}_txt{j}"])
            all_tracks.append([notes])
    write(os.path.join(d1, "swap_all.mid"), all_tracks,
          [f"swap_{i}_{j}" for i in range(k) for j in range(k)])

    # more_examples: a larger grid in one multi-track file (the reference
    # ships swap_31by31.mid)
    k2 = min(2 * k, len(np.unique(train_c.song_id)), 8)
    if k2 >= 2:
        idx2 = pick_segments(k2)
        pm2, c2 = feats_at(idx2)
        dc2, dr2 = sampler.encode(pm2, c2)
        grids2 = swap_grid(dc2.mean, dr2.mean, k2)
        write(os.path.join(d1, "more_examples", f"swap_{k2}by{k2}.mid"),
              [[grid_notes(g)] for g in grids2],
              [f"swap_{i}_{j}" for i in range(k2) for j in range(k2)])

    # -- 1b: 16-bar whole-song style transfer: all.mid holds the four scores
    # A, B, A-chd+B-txt, B-chd+A-txt (readme.txt:10-13), plus the individual
    # per-score files the reference ships next to it; more_examples holds
    # additional song pairs --------------------------------------------------
    songs = SongDataset(train_c, min_bars=12)
    fig_names = ["A_original", "B_original", "Achd_Btxt", "Bchd_Atxt"]

    def transfer_16bar(out_dir, sa, sb):
        os.makedirs(out_dir, exist_ok=True)
        n_win = 8  # 8 windows x 2 bars = 16 bars
        length = min(2 * n_win, min(songs.song_len[sa], songs.song_len[sb]))
        ba = songs.get_song_batch(sa, length=length)
        bb = songs.get_song_batch(sb, length=length)
        fa = tensorize_batch(jnp.asarray(ba["pr"]), jnp.asarray(ba["chord"]),
                             jnp.asarray(ba["shift"]), spec=spec,
                             with_detrend=False)
        fb = tensorize_batch(jnp.asarray(bb["pr"]), jnp.asarray(bb["chord"]),
                             jnp.asarray(bb["shift"]), spec=spec,
                             with_detrend=False)
        da_chd, da_rhy = sampler.encode(fa["pr_mat"], fa["c"])
        db_chd, db_rhy = sampler.encode(fb["pr_mat"], fb["c"])
        versions = [
            (da_chd.mean, da_rhy.mean), (db_chd.mean, db_rhy.mean),
            (da_chd.mean, db_rhy.mean), (db_chd.mean, da_rhy.mean)]
        tracks = []
        for name, (zc, zr) in zip(fig_names, versions):
            seg_notes = [grid_notes(g) for g in sampler.decode(zc, zr)]
            write(os.path.join(out_dir, f"{name}.mid"), [seg_notes], [name])
            tracks.append(seg_notes)
        write(os.path.join(out_dir, "all.mid"), tracks, fig_names)

    pairs = [(2 * p, 2 * p + 1) for p in range(len(songs) // 2)][:3]
    if len(songs) >= 2 and not pairs:
        pairs = [(0, 1)]
    for p, (sa, sb) in enumerate(pairs):
        base = os.path.join(d1, "16bar_style_transfer")
        out_dir = base if p == 0 else os.path.join(base, "more_examples",
                                                   f"sample{p}")
        transfer_16bar(out_dir, sa, sb)

    # -- 2: texture variation (posterior + prior sampling) -------------------
    d2p = os.path.join(args.out, "2_texture_variation", "posterior_sampling")
    d2q = os.path.join(args.out, "2_texture_variation", "prior_sampling")

    def posterior_set(out_dir, seg_i, key0):
        """original + 3 posterior texture samples of one source segment
        (readme.txt: posterior_sampling has original.mid + >=3 samples)."""
        write(os.path.join(out_dir, "original.mid"),
              [[grid_notes(sampler.decode(z_chd[seg_i:seg_i + 1],
                                          z_rhy[seg_i:seg_i + 1])[0])]],
              ["original"])
        for s in range(3):
            est = sampler.posterior_sample(
                jax.random.PRNGKey(key0 + s), pr_mat[seg_i:seg_i + 1],
                c[seg_i:seg_i + 1], scale=1.0, sample_chd=False,
                sample_txt=True)
            write(os.path.join(out_dir, f"post_sample_{s}.mid"),
                  [[grid_notes(est[0])]], ["posterior"])

    posterior_set(d2p, 0, 100)
    for n in range(1, min(4, k)):
        posterior_set(os.path.join(d2p, "more_examples", f"sample{n}"),
                      n, 100 + 10 * n)

    # prior sampling conditioned on the reference's NAMED progressions:
    # z_chd from the chord encoder over the symbol table, texture ~ N(0, I)
    for n, prog in enumerate(PRIOR_PROGRESSIONS):
        cp = progression_chord(prog)
        zc = dv.encode_chord(model.params, cfg, cp).mean
        zr = jax.random.normal(jax.random.PRNGKey(200 + n),
                               (1, cfg.txt_z_dim))
        est = sampler.decode(zc, zr)
        out_dir = d2q if n == 0 else os.path.join(d2q, "more_examples")
        write(os.path.join(out_dir, f"{prog}.mid"),
              [[grid_notes(est[0])]], [prog])
    # keep the unconditioned prior samples of the round-1 tree as well
    for s in range(2):
        est = sampler.prior_sample(jax.random.PRNGKey(300 + s), pr_mat[:1],
                                   c[:1], sample_rhy=True)
        write(os.path.join(d2q, f"prior_sample_{s}.mid"),
              [[grid_notes(est[0])]], ["prior"])

    # -- 3: accompaniment arrangement (windowed texture re-use) --------------
    # whole chord progression given + the first 1 (given2bar) or 2 (given4bar)
    # windows' accompaniment textures given; the rest is arranged
    d3 = os.path.join(args.out, "3_acc_arrangement")

    def arrange(song_i, given_windows, n_win=None):
        length = songs.song_len[song_i] if n_win is None \
            else min(2 * n_win, songs.song_len[song_i])
        b = songs.get_song_batch(song_i, length=length)
        f = tensorize_batch(jnp.asarray(b["pr"]), jnp.asarray(b["chord"]),
                            jnp.asarray(b["shift"]), spec=spec,
                            with_detrend=False)
        dchd, drhy = sampler.encode(f["pr_mat"], f["c"])
        n = dchd.mean.shape[0]
        g = min(given_windows, n)
        # donor textures: tile the given windows over the remainder
        reps = -(-n // g)
        zr = jnp.tile(drhy.mean[:g], (reps, 1))[:n]
        est = sampler.decode(dchd.mean, zr)
        segs = [grid_notes(e) for e in est]
        mel = b.get("mel")
        tracks, names = [segs], ["arranged_acc"]
        if mel is not None and np.asarray(mel).size:
            mel_segs = [dm.mel_pr_to_notes(m, bpm=args.bpm) for m in mel]
            if any(len(s) for s in mel_segs):
                tracks, names = [mel_segs, segs], ["melody", "arranged_acc"]
        return tracks, names, n

    if len(songs) >= 1:
        tracks, names, _ = arrange(0, given_windows=1, n_win=4)
        write(os.path.join(d3, "fig_generation_given2bar.mid"), tracks, names)
        for n_s in range(min(3, len(songs))):
            for g, tag in ((1, "given2bar"), (2, "given4bar")):
                tracks, names, _ = arrange(n_s, given_windows=g, n_win=4)
                write(os.path.join(d3, "more_examples",
                                   f"sample{n_s + 1}_{tag}.mid"),
                      tracks, names)
        # long generation: >= 16 bars, ITERATIVE — each new window's texture
        # is the posterior of the previously GENERATED window (the reference
        # iteratively calls the model for long accompaniment,
        # readme.txt:26-28)
        song_i = 0
        length = songs.song_len[song_i]
        b = songs.get_song_batch(song_i, length=length)
        f = tensorize_batch(jnp.asarray(b["pr"]), jnp.asarray(b["chord"]),
                            jnp.asarray(b["shift"]), spec=spec,
                            with_detrend=False)
        dchd, drhy = sampler.encode(f["pr_mat"], f["c"])
        n = dchd.mean.shape[0]
        given = min(2, n)
        zr_t = drhy.mean[given - 1:given]
        segs = [grid_notes(sampler.decode(dchd.mean[t:t + 1],
                                          drhy.mean[t:t + 1])[0])
                for t in range(given)]
        for t in range(given, n):
            est = sampler.decode(dchd.mean[t:t + 1], zr_t)[0]
            segs.append(grid_notes(est))
            # re-encode the generated window for the next step's texture
            pr_est, _ = dm.grid_to_pr_and_notes(np.asarray(est),
                                                bpm=args.bpm, spec=spec)
            pm_est = tz.pr_to_dur_matrix(
                jnp.asarray(pr_est[None].astype(np.int32)))
            _, dr_est = sampler.encode(pm_est, f["c"][t:t + 1])
            zr_t = dr_est.mean
        write(os.path.join(d3, "more_examples", "long_generation",
                           "sample1_given4bar.mid"), [segs],
              ["arranged_acc"])

    # keep the round-1 whole-sequence donor-texture file
    zc_seq = z_chd
    zr_seq = jnp.repeat(z_rhy[:1], k, axis=0)
    grids3 = sampler.decode(zc_seq, zr_seq)
    segs = [grid_notes(grids3[i]) for i in range(k)]
    mel_segs = [dm.mel_pr_to_notes(train_c.mel[int(ix)], bpm=args.bpm)
                for ix in idx]
    if any(len(s) for s in mel_segs):
        tracks, names = [mel_segs, segs], ["melody", "arranged_acc"]
    else:
        tracks, names = [segs], ["arranged_acc"]
    write(os.path.join(d3, "arrangement_given_texture.mid"), tracks, names)

    # -- 4: chord progression interpolation -----------------------------------
    # corpus-pair SLERP (round 1) + the reference's named progression pairs,
    # BOTH directions (demo/chord_prog_interpolation file names)
    d4 = os.path.join(args.out, "chord_prog_interpolation")
    est = sampler.interp(pr_mat[:1], c[:1], pr_mat[1:2], c[1:2],
                         interp_chd=True, int_count=6)
    write(os.path.join(d4, "interp_chd.mid"),
          [[grid_notes(est[0, i]) for i in range(6)]], ["chord_interp"])

    zr_donor = z_rhy[:1]
    for pa, pb in INTERP_PAIRS:
        za = dv.encode_chord(model.params, cfg, progression_chord(pa)).mean
        zb = dv.encode_chord(model.params, cfg, progression_chord(pb)).mean
        for name, (z1, z2) in ((f"{pa}_to_{pb}", (za, zb)),
                               (f"{pb}_to_{pa}", (zb, za))):
            path = dv.interp_path(np.asarray(z1[0]), np.asarray(z2[0]),
                                  int_count=6)
            zcs = jnp.asarray(path)
            zrs = jnp.repeat(zr_donor, 6, axis=0)
            grids4 = sampler.decode(zcs, zrs)
            write(os.path.join(d4, f"{name}.mid"),
                  [[grid_notes(g) for g in grids4]], [name])

    n_files = sum(len(fs) for _, _, fs in os.walk(args.out))
    print(f"wrote {n_files} MIDI files under {args.out}/")


if __name__ == "__main__":
    main()
