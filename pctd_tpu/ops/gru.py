"""GRU primitives as jit/scan-friendly pure functions.

TPU-first design notes
----------------------
The reference drives torch ``nn.GRU`` objects step-by-step from Python loops
(e.g. /root/reference/ptvae.py:430-491). Here a GRU sequence is one
``lax.scan`` whose per-step work is a single (B, H) @ (H, 3H) matmul on the
MXU: the *input* projection of the whole sequence is hoisted out of the scan
into one large batched matmul (``input_proj``), which is the classic way to
make RNNs MXU-bound instead of latency-bound.

Variable-length sequences (torch ``pack_padded_sequence``, reference
ptvae.py:195/447/480) are replaced by dense tensors + masked hidden-state
updates: ``h = where(t < length, h_new, h)``. Forward final state equals the
hidden after step ``length-1``; the backward direction scans the reversed
sequence with the reversed mask, which reproduces pack's "start at the last
valid element" semantics exactly (hidden stays at h0 until the first valid
element is reached).

Gate convention matches torch (r, z, n):
    r = sig(Wr x + br + Ur h + cr)
    z = sig(Wz x + bz + Uz h + cz)
    n = tanh(Wn x + bn + r * (Un h + cn))
    h' = (1 - z) * n + z * h
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pctd_tpu.utils.init import uniform


class GRUParams(NamedTuple):
    w_ih: jax.Array  # (in_dim, 3H)
    w_hh: jax.Array  # (H, 3H)
    b_ih: jax.Array  # (3H,)
    b_hh: jax.Array  # (3H,)

    @property
    def hidden_dim(self) -> int:
        return self.w_hh.shape[0]


def gru_init(key: jax.Array, in_dim: int, hidden_dim: int,
             dtype=jnp.float32) -> GRUParams:
    ks = jax.random.split(key, 4)
    s = 1.0 / math.sqrt(hidden_dim)
    return GRUParams(
        w_ih=uniform(ks[0], (in_dim, 3 * hidden_dim), s, dtype),
        w_hh=uniform(ks[1], (hidden_dim, 3 * hidden_dim), s, dtype),
        b_ih=uniform(ks[2], (3 * hidden_dim,), s, dtype),
        b_hh=uniform(ks[3], (3 * hidden_dim,), s, dtype),
    )


def input_proj(p: GRUParams, x: jax.Array) -> jax.Array:
    """Hoistable input projection: x @ W_ih + b_ih over any leading dims."""
    return x @ p.w_ih + p.b_ih


def gru_gates_pre(gi: jax.Array, gh: jax.Array, h: jax.Array) -> jax.Array:
    """GRU gate math from precomputed input AND hidden projections (both
    (B, 3H)). Bit-identical to :func:`gru_cell_pre` when ``gh`` is
    ``h @ w_hh + b_hh`` — callers use this to source ``gh`` from a
    column-slice of a combined matmul (same contraction per column, so the
    slice is exact) and keep the hidden dot off a serial chain."""
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_cell_pre(p: GRUParams, gi: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step given a precomputed input projection ``gi`` (B, 3H)."""
    return gru_gates_pre(gi, h @ p.w_hh + p.b_hh, h)


def gru_cell(p: GRUParams, x: jax.Array, h: jax.Array) -> jax.Array:
    return gru_cell_pre(p, input_proj(p, x), h)


def gru_scan(
    p: GRUParams,
    xs: jax.Array,                       # (B, T, D)
    h0: Optional[jax.Array] = None,      # (B, H)
    mask: Optional[jax.Array] = None,    # (B, T) bool; True = valid step
    reverse: bool = False,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Run a full GRU over time. Returns (ys (B, T, H), h_final (B, H)).

    With ``reverse=True`` the sequence is processed T-1 .. 0 (ys stays aligned
    with xs). Masked steps hold the carried hidden state, matching
    pack_padded_sequence final-state semantics in both directions.
    """
    B, T, _ = xs.shape
    H = p.hidden_dim
    if h0 is None:
        h0 = jnp.zeros((B, H), xs.dtype)
    gi = input_proj(p, xs)                      # one big MXU matmul
    gi_t = jnp.swapaxes(gi, 0, 1)               # (T, B, 3H)
    if mask is not None:
        mask_t = jnp.swapaxes(mask, 0, 1)[..., None]  # (T, B, 1)
        xs_scan = (gi_t, mask_t)
    else:
        xs_scan = (gi_t, None)

    def step(h, inp):
        gi_s, m = inp
        h_new = gru_cell_pre(p, gi_s, h)
        if m is not None:
            h_new = jnp.where(m, h_new, h)
        return h_new, h_new

    h_final, ys = jax.lax.scan(step, h0, xs_scan, reverse=reverse,
                               unroll=unroll)
    return jnp.swapaxes(ys, 0, 1), h_final


def bigru_last(p_fwd: GRUParams, p_bwd: GRUParams,
               xs: jax.Array) -> jax.Array:
    """Bidirectional GRU over full-length sequences; returns [h_fwd, h_bwd]
    concatenated (B, 2H) — the torch ``gru(x)[-1]`` + transpose + view idiom
    (reference ptvae.py:22-25).

    Both directions run in ONE scan: the reversed sequence is stacked on the
    batch axis and the two directions' weights form a leading-dim-2 batched
    matmul. Halves the number of while loops (TPU compile time scales with
    loop count) and doubles the matmul batch (better MXU utilization).
    """
    return bigru_last_masked(p_fwd, p_bwd, xs, None)


def bigru_last_masked(p_fwd: GRUParams, p_bwd: GRUParams,
                      xs: jax.Array,
                      lengths: Optional[jax.Array],
                      unroll: int = 1) -> jax.Array:
    """Bidirectional GRU with per-sample valid lengths (pack_padded parity).

    xs: (B, T, D); lengths: (B,) int or None (full length). Returns (B, 2H):
    forward final hidden at step len-1, backward final hidden after scanning
    t = len-1 .. 0 (both match torch pack_padded_sequence final states).
    """
    B, T, D = xs.shape
    H = p_fwd.hidden_dim
    w_ih = jnp.stack([p_fwd.w_ih, p_bwd.w_ih])          # (2, D, 3H)
    w_hh = jnp.stack([p_fwd.w_hh, p_bwd.w_hh])          # (2, H, 3H)
    b_ih = jnp.stack([p_fwd.b_ih, p_bwd.b_ih])          # (2, 3H)
    b_hh = jnp.stack([p_fwd.b_hh, p_bwd.b_hh])

    xs2 = jnp.stack([xs, jnp.flip(xs, axis=1)])          # (2, B, T, D)
    gi = jnp.einsum("dbti,dij->dbtj", xs2, w_ih) + b_ih[:, None, None, :]
    gi_t = jnp.moveaxis(gi, 2, 0)                        # (T, 2, B, 3H)

    if lengths is not None:
        t_idx = jnp.arange(T)[None, :]
        mask = t_idx < lengths[:, None]                  # (B, T)
        mask2 = jnp.stack([mask, jnp.flip(mask, axis=1)])  # (2, B, T)
        mask_t = jnp.moveaxis(mask2, 2, 0)[..., None]    # (T, 2, B, 1)
        xs_scan = (gi_t, mask_t)
    else:
        xs_scan = (gi_t, None)

    def step(h, inp):
        gi_s, m = inp                                    # (2, B, 3H)
        gh = jnp.einsum("dbh,dhj->dbj", h, w_hh) + b_hh[:, None, :]
        i_r, i_z, i_n = jnp.split(gi_s, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        if m is not None:
            h_new = jnp.where(m, h_new, h)
        return h_new, None

    h0 = jnp.zeros((2, B, H), xs.dtype)
    h_final, _ = jax.lax.scan(step, h0, xs_scan, unroll=unroll)
    return jnp.concatenate([h_final[0], h_final[1]], axis=-1)
