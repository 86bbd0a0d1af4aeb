"""Fused Pallas frame-decoder kernel vs the XLA nested-scan decode.

Runs in interpreter mode on the CPU test mesh (bit-compatible f32 math), so
the kernel's semantics are checked exactly against the reference-parity XLA
path; speed is measured on real TPU by bench.py.
"""

import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy


import numpy as np
import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import pianotree_decoder as ptd
from pctd_tpu.ops.pallas.ar_decoder import frame_decode_pallas

from tests.test_training import SMALL


def test_frame_kernel_matches_xla_decode_notes():
    cfg = SMALL
    spec = cfg.pianotree
    p = ptd.init(jax.random.PRNGKey(0), cfg)
    B = 4
    h_time = jax.random.normal(jax.random.PRNGKey(1),
                               (B, cfg.dec_time_hidden)) * 0.6
    sos_emb = ptd.dense_apply(
        p["note_emb"], ptd.sos_token_raw(spec))
    sos_emb = jnp.broadcast_to(sos_emb, (B, cfg.note_emb_size))

    # XLA inference path for one frame (serving folds — the kernel's math)
    pitch_o, dur_o, pred_notes, lengths = ptd._decode_notes(
        p, spec, h_time, None, None, sos_emb,
        folds=ptd.fold_inference_heads(p, cfg))
    from pctd_tpu.ops import bigru_last_masked
    summary = bigru_last_masked(p["emb_fwd"], p["emb_bwd"], pred_notes,
                                lengths)

    k_pitch, k_bits, k_summary, k_len = frame_decode_pallas(
        p, cfg, h_time, sos_emb, interpret=True)

    np.testing.assert_array_equal(np.asarray(k_pitch),
                                  np.argmax(np.asarray(pitch_o), -1))
    np.testing.assert_array_equal(np.asarray(k_bits),
                                  np.argmax(np.asarray(dur_o), -1))
    np.testing.assert_array_equal(np.asarray(k_len), np.asarray(lengths))
    np.testing.assert_allclose(np.asarray(k_summary), np.asarray(summary),
                               atol=2e-5)


def test_fold_inference_heads_is_value_equivalent():
    """The serving weight folds (fold_inference_heads) are mathematical
    regroupings: folded and unfolded XLA decodes must agree to float
    round-off on logits (and, on this model, exactly on the argmax grid)."""
    cfg = SMALL
    params = ptd.init(jax.random.PRNGKey(2), cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (3, cfg.z_dim))
    plain = ptd.decode(params, cfg, z)
    folded = ptd.decode(params, cfg, z, fold_heads=True)
    np.testing.assert_allclose(np.asarray(folded.pitch_logits),
                               np.asarray(plain.pitch_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(folded.dur_logits),
                               np.asarray(plain.dur_logits), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(ptd.output_to_grid(folded)),
        np.asarray(ptd.output_to_grid(plain)))


def test_decode_grid_pallas_matches_xla():
    cfg = SMALL
    p = ptd.init(jax.random.PRNGKey(2), cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (3, cfg.z_dim)) * 0.5
    grid_xla = ptd.decode_grid(p, cfg, z, frame_decoder="xla")
    grid_pl = ptd.decode_grid(p, cfg, z, frame_decoder="pallas",
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(grid_pl), np.asarray(grid_xla))


def test_decode_grid_pallas_canonical_dims():
    """Full canonical dims through the kernel (interpret mode)."""
    cfg = ModelConfig()
    p = ptd.init(jax.random.PRNGKey(4), cfg)
    z = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.z_dim)) * 0.5
    grid_xla = ptd.decode_grid(p, cfg, z, frame_decoder="xla")
    grid_pl = ptd.decode_grid(p, cfg, z, frame_decoder="pallas",
                              interpret=True)
    assert (np.asarray(grid_pl) == np.asarray(grid_xla)).mean() > 0.999


def test_full_decoder_kernel_matches_xla():
    """Whole-decode fused kernel (all 32 time steps in one pallas_call,
    ops/pallas/full_decoder.py) is bit-exact vs the XLA nested-scan decode
    in interpreter mode."""
    from pctd_tpu.ops.pallas.full_decoder import decode_grid_fused

    cfg = SMALL
    p = ptd.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.z_dim))
    ref = np.asarray(ptd.decode_grid(p, cfg, z, frame_decoder="xla"))
    fused = np.asarray(decode_grid_fused(p, cfg, z, interpret=True))
    np.testing.assert_array_equal(ref, fused)


def test_full_decoder_via_decode_grid_dispatch():
    cfg = SMALL
    p = ptd.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.z_dim))
    a = np.asarray(ptd.decode_grid(p, cfg, z, frame_decoder="pallas_full",
                                   interpret=True))
    b = np.asarray(ptd.decode_grid(p, cfg, z, frame_decoder="xla"))
    np.testing.assert_array_equal(a, b)
