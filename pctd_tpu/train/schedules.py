"""Training-parameter schedules, jit-safe.

Capabilities of the reference's scheduler stack (amc_dl/torch_plus/
scheduler.py, train_utils.py:17-30, example.py): scheduled-sampling teacher
forcing, mirrored KL annealing, constant params, and exponential LR decay with
a floor. Here each schedule is a pure function of the (traced) step, so the
whole schedule evaluates inside the jitted train step — no host round trips
and no per-step recompilation.

The reference's transition is a sigmoid in the *raw batch counter*, which
collapses within ~1 batch (quirk documented in SURVEY.md §2). ``horizon``
rescales the step axis; horizon=1.0 reproduces the reference exactly.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import optax

from pctd_tpu.config import TrainConfig


def scheduled_sampling(i, high: float, low: float):
    """sigmoid(-10 (i - 0.5)) scaled to [low, high]
    (reference train_utils.py:17-21)."""
    x = 10.0 * (i - 0.5)
    z = 1.0 / (1.0 + jnp.exp(x))
    return (high - low) * z + low


def kl_annealing(i, high: float, low: float):
    """Mirror ramp from low up to high (reference kl_anealing,
    train_utils.py:24-30)."""
    hh, ll = 1.0 - low, 1.0 - high
    x = 10.0 * (i - 0.5)
    z = 1.0 / (1.0 + jnp.exp(x))
    return 1.0 - ((hh - ll) * z + ll)


def train_params_at(step, cfg: TrainConfig) -> Dict[str, jnp.ndarray]:
    """All scheduled scalars at a (possibly traced) step: tfr1/2/3 and beta
    (the reference ParameterScheduler dict, train.py:59-67)."""
    i = step / cfg.sched_horizon
    (h1, l1), (h2, l2), (h3, l3) = cfg.tf_rates
    return {
        "tfr1": scheduled_sampling(i, h1, l1),
        "tfr2": scheduled_sampling(i, h2, l2),
        "tfr3": scheduled_sampling(i, h3, l3),
        "beta": kl_annealing(i, cfg.beta, 0.0),
    }


def final_params(cfg: TrainConfig) -> Dict[str, float]:
    """The schedules' asymptotic (end-of-training) values: tfr at their low
    ends, beta fully annealed. Used for schedule-invariant validation
    (TrainConfig.eval_fixed_schedule)."""
    (_, l1), (_, l2), (_, l3) = cfg.tf_rates
    return {"tfr1": l1, "tfr2": l2, "tfr3": l3, "beta": cfg.beta}


def lr_schedule(cfg: TrainConfig):
    """Exponential decay per step with a floor (reference MinExponentialLR,
    example.py:4-13, stepped per batch via OptimizerScheduler)."""
    return optax.exponential_decay(
        init_value=cfg.lr, transition_steps=1, decay_rate=cfg.lr_decay,
        end_value=cfg.lr_min)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam + global-norm clipping + MinExponentialLR (reference
    train.py:50-52, module.py:140-144)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adam(lr_schedule(cfg)),
    )
