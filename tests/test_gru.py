"""GRU scan parity vs torch.nn.GRU, including pack_padded_sequence semantics.

The decoder/encoder stack is GRUs end to end, so exact cell/final-state parity
here underwrites every module above (SURVEY.md §4 test strategy).
"""
import numpy as np
import jax
import jax.numpy as jnp

import torch
from torch.nn.utils.rnn import pack_padded_sequence

from pctd_tpu.ops import (GRUParams, gru_init, gru_cell, gru_scan,
                          bigru_last, bigru_last_masked)

B, T, D, H = 4, 7, 5, 6


def make_pair(seed=0, in_dim=D, hid=H):
    """Random torch GRU + matching GRUParams."""
    torch.manual_seed(seed)
    tg = torch.nn.GRU(in_dim, hid, batch_first=True, bidirectional=False)
    p = GRUParams(
        w_ih=jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
        b_ih=jnp.asarray(tg.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(tg.bias_hh_l0.detach().numpy()),
    )
    return tg, p


def test_cell_matches_torch_single_step():
    tg, p = make_pair(0)
    x = np.random.RandomState(1).randn(B, 1, D).astype(np.float32)
    h0 = np.random.RandomState(2).randn(1, B, H).astype(np.float32)
    with torch.no_grad():
        _, ht = tg(torch.from_numpy(x), torch.from_numpy(h0))
    h_j = gru_cell(p, jnp.asarray(x[:, 0]), jnp.asarray(h0[0]))
    np.testing.assert_allclose(np.asarray(h_j), ht[0].numpy(), atol=1e-5)


def test_scan_matches_torch_full_sequence():
    tg, p = make_pair(3)
    x = np.random.RandomState(4).randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        ys_t, ht = tg(torch.from_numpy(x))
    ys_j, h_j = gru_scan(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ys_j), ys_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), ht[0].numpy(), atol=1e-5)


def test_masked_scan_matches_pack_padded_forward():
    tg, p = make_pair(5)
    rng = np.random.RandomState(6)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([7, 3, 1, 5])
    with torch.no_grad():
        packed = pack_padded_sequence(torch.from_numpy(x),
                                      torch.from_numpy(lengths),
                                      batch_first=True, enforce_sorted=False)
        _, ht = tg(packed)
    mask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    _, h_j = gru_scan(p, jnp.asarray(x), mask=mask)
    np.testing.assert_allclose(np.asarray(h_j), ht[0].numpy(), atol=1e-5)


def test_masked_bigru_matches_pack_padded_bidirectional():
    torch.manual_seed(7)
    tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
    pf = GRUParams(
        w_ih=jnp.asarray(tg.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(tg.weight_hh_l0.detach().numpy().T),
        b_ih=jnp.asarray(tg.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(tg.bias_hh_l0.detach().numpy()),
    )
    pb = GRUParams(
        w_ih=jnp.asarray(tg.weight_ih_l0_reverse.detach().numpy().T),
        w_hh=jnp.asarray(tg.weight_hh_l0_reverse.detach().numpy().T),
        b_ih=jnp.asarray(tg.bias_ih_l0_reverse.detach().numpy()),
        b_hh=jnp.asarray(tg.bias_hh_l0_reverse.detach().numpy()),
    )
    rng = np.random.RandomState(8)
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([2, 7, 4, 1])
    with torch.no_grad():
        packed = pack_padded_sequence(torch.from_numpy(x),
                                      torch.from_numpy(lengths),
                                      batch_first=True, enforce_sorted=False)
        _, ht = tg(packed)
    # torch final hidden: (2, B, H) -> transpose(0,1) -> (B, 2H) [fwd, bwd]
    expected = ht.transpose(0, 1).contiguous().view(B, -1).numpy()
    got = bigru_last_masked(pf, pb, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    # full-length variant agrees with lengths == T
    got_full = bigru_last(pf, pb, jnp.asarray(x))
    with torch.no_grad():
        _, ht_full = tg(torch.from_numpy(x))
    exp_full = ht_full.transpose(0, 1).contiguous().view(B, -1).numpy()
    np.testing.assert_allclose(np.asarray(got_full), exp_full, atol=1e-5)


def test_gru_init_shapes_and_jittability():
    p = gru_init(jax.random.PRNGKey(0), D, H)
    assert p.w_ih.shape == (D, 3 * H) and p.w_hh.shape == (H, 3 * H)
    x = jnp.ones((B, T, D))
    ys, h = jax.jit(lambda a: gru_scan(p, a))(x)
    assert ys.shape == (B, T, H) and h.shape == (B, H)
    assert np.isfinite(np.asarray(ys)).all()
