"""Canonical-dims convergence-parity record (VERDICT r2 item 4).

Trains the torch reference (CPU, its exact optimizer stack: Adam +
MinExponentialLR + clip_grad_norm_, reference train.py:50-52 /
module.py:140-144 / example.py:4-13) and pctd_tpu (optax stack,
schedules.make_optimizer) SIDE BY SIDE at CANONICAL dims
(ModelConfig() == reference model.py:244-265) from the SAME transplanted
initial weights, on the SAME real-music corpus ingested from the
reference's demo MIDIs, with deterministic semantics (posterior means,
full teacher forcing — no RNG draws), and commits the side-by-side
loss-curve record:

    runs/parity_canonical/record.json   — machine-readable curves + config
    runs/parity_canonical/README.md     — the table + stated tolerance

This is the canonical-dims, multi-epoch, real-music complement of the
SMALL-dims assertion in tests/test_convergence_parity.py.

    JAX_PLATFORMS=cpu python scripts/parity_record.py
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def collect_batches(midi_dir: str, batch_size: int, steps_per_epoch: int,
                    seed: int):
    import jax.numpy as jnp
    import numpy as np

    from pctd_tpu.config import DataConfig, ModelConfig
    from pctd_tpu.data.ingest import ingest_directory
    from pctd_tpu.data.loaders import make_loaders
    from pctd_tpu.train.trainer import batch_features

    mcfg = ModelConfig()
    dcfg = DataConfig()
    train_c, _ = ingest_directory(midi_dir, dcfg,
                                  cache="/tmp/pctd_parity_corpus")
    tl, _ = make_loaders(train_c, train_c, batch_size=batch_size, seed=seed)
    batches = []
    it = tl.epoch()
    while len(batches) < steps_per_epoch:
        try:
            b = next(it)
        except StopIteration:
            it = tl.epoch()
            continue
        x, c, pr_mat, _ = batch_features(jnp.asarray(b["pr"]),
                                         jnp.asarray(b["chord"]),
                                         jnp.asarray(b["shift"]), mcfg)
        batches.append((np.asarray(x, np.int64), np.asarray(c, np.float32),
                        np.asarray(pr_mat, np.float32)))
    return batches, len(train_c)


def torch_trajectory(batches, betas, tcfg):
    import torch

    from tests.reference_oracle import load_reference

    REF = load_reference()
    sys.path.insert(0, "/root/reference")
    from amc_dl.torch_plus.example import MinExponentialLR

    torch.manual_seed(0)
    ref = REF.model.DisentangleVAE.init_model(device=torch.device("cpu"))

    from tests import torch_bridge as tb

    params = {
        "chd_enc": tb.chord_encoder_params(ref.chd_encoder),
        "txt_enc": tb.texture_conv_params(ref.rhy_encoder),
        "dec": tb.pianotree_decoder_params(ref.decoder),
        "chd_dec": tb.chord_decoder_params(ref.chd_decoder),
    }
    # deep copy before torch's in-place Adam updates (tensor.numpy() views
    # may alias into jax CPU buffers)
    import jax
    import jax.numpy as jnp
    import numpy as np

    params = jax.tree_util.tree_map(lambda a: jnp.array(np.array(a)), params)

    opt = torch.optim.Adam(ref.parameters(), lr=tcfg.lr)
    sched = MinExponentialLR(opt, gamma=tcfg.lr_decay, minimum=tcfg.lr_min)
    orig = REF.model.get_zs_from_dists
    REF.model.get_zs_from_dists = lambda dists, sample=False: \
        [d.mean for d in dists]
    losses, step_secs = [], []
    try:
        for s, beta in enumerate(betas):
            x, c, pr_mat = batches[s % len(batches)]
            t0 = time.perf_counter()
            opt.zero_grad()
            outs = ref.loss(torch.from_numpy(x), torch.from_numpy(c),
                            torch.from_numpy(pr_mat), tfr1=1.0, tfr2=1.0,
                            tfr3=1.0, beta=beta, weights=(1.0, 0.5))
            outs[0].backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), tcfg.clip_norm)
            opt.step()
            sched.step()
            step_secs.append(time.perf_counter() - t0)
            losses.append(float(outs[0].item()))
            print(f"[torch] step {s}: loss {losses[-1]:.4f} "
                  f"({step_secs[-1]:.1f}s)", file=sys.stderr, flush=True)
    finally:
        REF.model.get_zs_from_dists = orig
    return params, losses, step_secs


def jax_trajectory(params, batches, betas, tcfg):
    import jax
    import jax.numpy as jnp
    import optax

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.train import schedules

    mcfg = ModelConfig()
    tx = schedules.make_optimizer(tcfg)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)          # consumed but inert (sample=False)

    @jax.jit
    def step(params, opt_state, x, c, pr_mat, beta):
        def loss_fn(p):
            total, _ = dv.loss(p, mcfg, key, x, c, pr_mat, tfr1=1.0,
                               tfr2=1.0, tfr3=1.0, beta=beta,
                               weights=(1.0, 0.5), sample=False)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    losses, step_secs = [], []
    for s, beta in enumerate(betas):
        x, c, pr_mat = batches[s % len(batches)]
        t0 = time.perf_counter()
        params, opt_state, total = step(params, opt_state, jnp.asarray(x),
                                        jnp.asarray(c), jnp.asarray(pr_mat),
                                        jnp.asarray(beta))
        losses.append(float(total))
        step_secs.append(time.perf_counter() - t0)
        print(f"[jax]   step {s}: loss {losses[-1]:.4f} "
              f"({step_secs[-1]:.1f}s)", file=sys.stderr, flush=True)
    return losses, step_secs


def write_record(out_dir, args, n_segments, torch_losses, jax_losses,
                 torch_secs, jax_secs, betas):
    import numpy as np

    t, j = np.asarray(torch_losses), np.asarray(jax_losses)
    rel = np.abs(j - t) / np.abs(t)
    spe = args.steps_per_epoch
    epochs = []
    for e in range(args.epochs):
        te, je = t[e * spe:(e + 1) * spe], j[e * spe:(e + 1) * spe]
        epochs.append({"epoch": e, "torch_mean": round(float(te.mean()), 4),
                       "jax_mean": round(float(je.mean()), 4),
                       "rel_diff": round(float(
                           abs(je.mean() - te.mean()) / te.mean()), 6)})
    record = {
        "what": "canonical-dims multi-epoch convergence parity, real-MIDI "
                "corpus (ingested from the reference demo tree), "
                "deterministic semantics (posterior means, tfr=1)",
        "config": {"dims": "ModelConfig() canonical (= reference "
                           "model.py:244-265)",
                   "batch_size": args.batch_size,
                   "steps_per_epoch": spe, "epochs": args.epochs,
                   "corpus_segments": n_segments,
                   "midi_dir": args.midi_dir,
                   "optimizer": "Adam lr=1e-3, MinExponentialLR "
                                "gamma=0.9999 floor=1e-5, clip=1 "
                                "(reference train.py:50-52) vs optax twin",
                   "beta_schedule": "reference kl_anealing "
                                    "(schedules.train_params_at)"},
        "tolerance": {"per_step_rel": 0.01, "epoch_mean_rel": 0.005,
                      "first_step_rel": 1e-4},
        "pass": bool(rel.max() < 0.01
                     and rel[0] < 1e-4
                     and all(e["rel_diff"] < 0.005 for e in epochs)
                     and epochs[-1]["torch_mean"] < epochs[0]["torch_mean"]
                     and epochs[-1]["jax_mean"] < epochs[0]["jax_mean"]),
        "torch_losses": [round(float(v), 5) for v in t],
        "jax_losses": [round(float(v), 5) for v in j],
        "per_step_rel_diff_max": round(float(rel.max()), 6),
        "epoch_means": epochs,
        "betas": [round(float(b), 6) for b in betas],
        "step_seconds": {"torch_cpu_median": round(float(
            np.median(torch_secs)), 2), "jax_cpu_median": round(float(
                np.median(jax_secs)), 2)},
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "record.json"), "w") as f:
        json.dump(record, f, indent=1)

    lines = [
        "# Canonical-dims convergence parity (torch reference vs pctd_tpu)",
        "",
        record["what"] + ".", "",
        f"Both frameworks start from the SAME transplanted weights and see "
        f"the SAME {args.batch_size}-segment batches of the "
        f"{n_segments}-segment corpus for {args.epochs} epochs x {spe} "
        f"steps. Stated tolerance: first step rel<=1e-4, per-step "
        f"rel<=1%, epoch-mean rel<=0.5%, both curves descending.",
        "", f"**Result: {'PASS' if record['pass'] else 'FAIL'}** — max "
        f"per-step rel diff {record['per_step_rel_diff_max']:.2e}.", "",
        "| epoch | torch mean loss | pctd_tpu mean loss | rel diff |",
        "|---|---|---|---|",
    ]
    for e in epochs:
        lines.append(f"| {e['epoch']} | {e['torch_mean']} | "
                     f"{e['jax_mean']} | {e['rel_diff']:.2e} |")
    lines += ["", "Per-step curves (loss):", "", "```",
              "step  torch      pctd_tpu"]
    for s in range(len(t)):
        lines.append(f"{s:>4}  {t[s]:<9.4f}  {j[s]:<9.4f}")
    lines += ["```", "",
              f"Reproduce: `JAX_PLATFORMS=cpu python scripts/"
              f"parity_record.py --epochs {args.epochs} --batch-size "
              f"{args.batch_size} --steps-per-epoch {spe}`"]
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return record


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--midi-dir", default="/root/reference/demo")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--steps-per-epoch", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "parity_canonical"))
    args = ap.parse_args()

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    from pctd_tpu.config import TrainConfig
    from pctd_tpu.train import schedules

    tcfg = TrainConfig(batch_size=args.batch_size)
    n_steps = args.epochs * args.steps_per_epoch
    import jax.numpy as jnp

    betas = [float(schedules.train_params_at(jnp.asarray(s), tcfg)["beta"])
             for s in range(n_steps)]

    batches, n_segments = collect_batches(args.midi_dir, args.batch_size,
                                          args.steps_per_epoch, seed=3)
    print(f"corpus: {n_segments} segments; {len(batches)} fixed batches",
          file=sys.stderr, flush=True)
    params, torch_losses, torch_secs = torch_trajectory(batches, betas, tcfg)
    jax_losses, jax_secs = jax_trajectory(params, batches, betas, tcfg)
    record = write_record(args.out, args, n_segments, torch_losses,
                          jax_losses, torch_secs, jax_secs, betas)
    print(json.dumps({"pass": record["pass"],
                      "max_rel": record["per_step_rel_diff_max"],
                      "out": args.out}))
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
