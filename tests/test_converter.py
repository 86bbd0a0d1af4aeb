"""Tensorizer parity: our vectorized host converters and the jitted on-device
tensorizer vs the reference's per-sample numpy loops."""
import numpy as np
import pytest
import jax.numpy as jnp

from pctd_tpu.data import converter as cv
from pctd_tpu.data import tensorize as tz
from pctd_tpu.data.detrend import detrend_pianotree_batch
from pctd_tpu.config import PianoTreeSpec

from tests.reference_oracle import load_reference, reference_available

REF = load_reference()
needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not mounted")


def make_random_ext_nmat(rng, n_notes=12, num_step=32):
    """Well-formed 2-bar segment: at most one active note per (pitch, time)."""
    rows = []
    used = set()
    for _ in range(n_notes):
        p = int(rng.randint(30, 90))
        s = int(rng.randint(0, num_step - 1))
        d = int(rng.randint(1, 8))
        e = min(s + d, num_step)
        if any((p, t) in used for t in range(s, e)):
            continue
        for t in range(s, e):
            used.add((p, t))
        sb, sq = divmod(s, 4)
        eb, eq = divmod(e, 4)
        rows.append([sb, sq, 4, eb, eq, 4, p, 100])
    return np.array(rows, dtype=float) if rows else None


def rolls_for_tests(n=8, seed=0):
    rng = np.random.RandomState(seed)
    return np.stack([cv.ext_nmat_to_pr(make_random_ext_nmat(rng))
                     for _ in range(n)])


@needs_ref
def test_ext_nmat_to_pr_parity():
    rng = np.random.RandomState(1)
    for _ in range(5):
        nmat = make_random_ext_nmat(rng)
        np.testing.assert_array_equal(cv.ext_nmat_to_pr(nmat),
                                      REF.converter.ext_nmat_to_pr(nmat))
        np.testing.assert_array_equal(cv.ext_nmat_to_mel_pr(nmat),
                                      REF.converter.ext_nmat_to_mel_pr(nmat))
    np.testing.assert_array_equal(cv.ext_nmat_to_pr(None),
                                  REF.converter.ext_nmat_to_pr(None))


@needs_ref
def test_piano_roll_to_target_parity():
    for pr in rolls_for_tests():
        for shift in (-6, 0, 5):
            a = cv.augment_pr(pr, shift)
            oh_ours = cv.pr_to_onehot_pr(a)
            oh_ref = REF.converter.pr_to_onehot_pr(a)
            np.testing.assert_array_equal(oh_ours, oh_ref)
            ours = cv.piano_roll_to_target(oh_ours.copy())
            ref = REF.converter.piano_roll_to_target(oh_ref.copy())
            np.testing.assert_array_equal(ours, ref)


@needs_ref
def test_piano_roll_to_target_parity_arbitrary_input():
    # exact recurrence parity even on rolls that are NOT well-formed
    rng = np.random.RandomState(7)
    pr = rng.randint(0, 3, size=(32, 128))
    ours = cv.piano_roll_to_target(cv.pr_to_onehot_pr(pr).copy())
    ref = REF.converter.piano_roll_to_target(
        REF.converter.pr_to_onehot_pr(pr).copy())
    np.testing.assert_array_equal(ours, ref)


@needs_ref
def test_target_to_3dtarget_parity():
    for pr in rolls_for_tests(seed=3):
        pr_mat = cv.piano_roll_to_target(cv.pr_to_onehot_pr(pr))
        kw = dict(max_note_count=16, max_pitch=128, min_pitch=0,
                  pitch_pad_ind=130, pitch_sos_ind=128, pitch_eos_ind=129)
        ours = cv.target_to_3dtarget(pr_mat, **kw)
        ref = REF.converter.target_to_3dtarget(pr_mat, **kw)
        np.testing.assert_array_equal(ours, ref)


@needs_ref
def test_expand_chord_parity():
    rng = np.random.RandomState(4)
    chords = np.zeros((6, 14))
    chords[:, 0] = rng.randint(0, 12, 6)
    chords[:, 1:13] = rng.randint(0, 2, (6, 12))
    chords[:, 13] = rng.randint(0, 12, 6)
    for c in chords:
        for shift in (-6, 0, 3):
            np.testing.assert_array_equal(
                cv.expand_chord(c, shift), REF.converter.expand_chord(c, shift))
    # batched version
    shifts = rng.randint(-6, 6, 6)
    batched = cv.batch_expand_chord(np.repeat(chords[:, None], 8, 1), shifts)
    for i in range(6):
        np.testing.assert_array_equal(
            batched[i, 0], REF.converter.expand_chord(chords[i], shifts[i]))


@needs_ref
def test_detrend_parity():
    rng = np.random.RandomState(5)
    prs = rolls_for_tests(4, seed=6)
    pr_mats = cv.piano_roll_to_target(cv.pr_to_onehot_pr(prs))
    grids = cv.batch_target_to_3dtarget(pr_mats)
    chords = np.zeros((4, 8, 14))
    chords[..., 0] = rng.randint(0, 12, (4, 8))
    chords[..., 1:13] = rng.randint(0, 2, (4, 8, 12))
    chords[..., 13] = rng.randint(0, 12, (4, 8))
    cexp = cv.batch_expand_chord(chords, np.zeros(4, int))
    ours = detrend_pianotree_batch(grids, cexp)
    for i in range(4):
        ref = REF.dataset.detrend_pianotree(grids[i], cexp[i])
        np.testing.assert_array_equal(ours[i], ref.astype(np.float32))


def test_batch_target_matches_single():
    prs = rolls_for_tests(4, seed=9)
    pr_mats = cv.piano_roll_to_target(cv.pr_to_onehot_pr(prs))
    batched = cv.batch_target_to_3dtarget(pr_mats)
    for i in range(4):
        single = cv.target_to_3dtarget(
            pr_mats[i], max_note_count=16, max_pitch=128, min_pitch=0,
            pitch_pad_ind=130, pitch_sos_ind=128, pitch_eos_ind=129)
        np.testing.assert_array_equal(batched[i], single)


def test_on_device_tensorize_matches_host():
    """The jitted einsum/scan pipeline == host numpy pipeline, incl. shifts."""
    prs = rolls_for_tests(6, seed=11).astype(np.uint8)
    rng = np.random.RandomState(12)
    chords = np.zeros((6, 8, 14))
    chords[..., 0] = rng.randint(0, 12, (6, 8))
    chords[..., 1:13] = rng.randint(0, 2, (6, 8, 12))
    chords[..., 13] = rng.randint(0, 12, (6, 8))
    shifts = rng.randint(-6, 6, 6)

    out = tz.tensorize_batch(jnp.asarray(prs), jnp.asarray(chords),
                             jnp.asarray(shifts), spec=PianoTreeSpec(),
                             with_detrend=True)

    # host path
    shifted = np.stack([cv.augment_pr(prs[i], shifts[i]) for i in range(6)])
    pr_mats = cv.piano_roll_to_target(cv.pr_to_onehot_pr(shifted))
    grids = cv.batch_target_to_3dtarget(pr_mats)
    cexp = cv.batch_expand_chord(chords, shifts)
    dt = detrend_pianotree_batch(grids, cexp)

    np.testing.assert_array_equal(np.asarray(out["pr_mat"]), pr_mats)
    np.testing.assert_array_equal(np.asarray(out["x"]), grids)
    np.testing.assert_allclose(np.asarray(out["c"]), cexp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["dt_x"]), dt, atol=1e-6)


def test_grid_eos_and_overflow_truncation():
    """Steps with > 14 simultaneous notes truncate to lowest pitches + eos."""
    pr_mat = np.zeros((1, 32, 128))
    pr_mat[0, 0, 10:30] = 4.0  # 20 simultaneous onsets at t=0
    grid = cv.batch_target_to_3dtarget(pr_mat)
    assert grid[0, 0, 0, 0] == 128                 # sos
    assert (grid[0, 0, 1:15, 0] == np.arange(10, 24)).all()
    assert grid[0, 0, 15, 0] == 129                # eos clamped to last slot
    g2 = np.asarray(tz.dur_matrix_to_grid(jnp.asarray(pr_mat)))
    np.testing.assert_array_equal(g2, grid)
