"""Convert checkpoints between the PyTorch reference and pctd_tpu.

A reference user switching to this framework brings their trained models:

    # reference .pt (torch.save state_dict, DataParallel prefix ok) -> ours
    python scripts/convert_checkpoint.py --from-torch disvae_final.pt \
        --out converted_ckpt

    # ours (params-only save, or a Trainer TrainState checkpoint) -> .pt
    # loadable by the reference's PytorchModel.load_model
    python scripts/convert_checkpoint.py --to-torch out.pt \
        --checkpoint runs/result_*/models/disvae_valid [--train-state]

Variant (conv vs pianotree texture encoder) is auto-detected from the
state_dict when importing; pass --variant to cross-check.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-torch", default=None,
                    help="reference .pt state_dict to import")
    ap.add_argument("--to-torch", default=None,
                    help="write a reference-loadable .pt here")
    ap.add_argument("--checkpoint", default=None,
                    help="pctd_tpu checkpoint to export (with --to-torch)")
    ap.add_argument("--train-state", action="store_true",
                    help="--checkpoint is a Trainer TrainState save, not a "
                         "params-only save")
    ap.add_argument("--out", default=None,
                    help="output checkpoint dir (with --from-torch)")
    ap.add_argument("--variant", default=None,
                    choices=["conv", "pianotree"],
                    help="expected texture-encoder variant (cross-check)")
    args = ap.parse_args()

    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure weight shuffling

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models.disentangle_vae import DisentangleVAE
    from pctd_tpu.utils import torch_interop as ti

    if args.from_torch:
        if not args.out:
            ap.error("--from-torch needs --out")
        import torch

        sd = ti.strip_dataparallel(
            torch.load(args.from_torch, map_location="cpu",
                       weights_only=True))
        variant = ti.detect_texture_variant(sd)
        if args.variant and args.variant != variant:
            ap.error(f"checkpoint is {variant!r}, --variant says "
                     f"{args.variant!r}")
        cfg = dataclasses.replace(ModelConfig(), txt_encoder=variant)
        params = ti.params_from_state_dict(sd, cfg)
        DisentangleVAE(cfg, params).save(args.out)
        print(f"imported {args.from_torch} ({variant} texture variant) "
              f"-> {args.out}")
    elif args.to_torch:
        if not args.checkpoint:
            ap.error("--to-torch needs --checkpoint")
        # the variant is load-bearing here (it shapes the restore template);
        # without --variant, try conv first, then pianotree
        variants = [args.variant] if args.variant else ["conv", "pianotree"]
        model, errors = None, {}
        for v in variants:
            cfg = dataclasses.replace(ModelConfig(), txt_encoder=v)
            try:
                if args.train_state:
                    model = DisentangleVAE.from_train_checkpoint(
                        args.checkpoint, cfg)
                else:
                    model = DisentangleVAE.init_model(
                        jax.random.PRNGKey(0), cfg).load(args.checkpoint)
                break
            except Exception as e:          # structure mismatch -> next
                model, errors[v] = None, e
        if model is None:
            # report every per-variant error so a non-variant failure
            # (missing path, corrupt file) is not masked as a variant issue
            detail = "; ".join(f"[{v}] {type(e).__name__}: {e}"
                               for v, e in errors.items())
            raise SystemExit(
                f"could not load {args.checkpoint} as "
                f"{' or '.join(variants)} texture variant: {detail}")
        ti.save_reference_checkpoint(args.to_torch, model.params)
        print(f"exported {args.checkpoint} -> {args.to_torch} "
              f"({v} texture variant, reference state_dict format)")
    else:
        ap.error("pass --from-torch or --to-torch")


if __name__ == "__main__":
    main()
