"""Serving Sampler wrapper: all four workflows through the compiled paths."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.models.sampler import Sampler

from tests.test_models_parity import random_batch
from tests.test_training import SMALL


@pytest.mark.slow
def test_sampler_workflows():
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    # xla frame decoder on the CPU test mesh (pallas path covered by
    # interpret-mode tests; compiled pallas needs TPU)
    s = Sampler(params, SMALL, frame_decoder="xla")
    x, c, pr_mat = random_batch(2, seed=50)
    x2, c2, pr2 = random_batch(2, seed=51)
    K1 = SMALL.pianotree.max_simu_note - 1
    key = jax.random.PRNGKey(1)

    est = s.swap(pr_mat, pr2, c, c2, fix_rhy=False, fix_chd=True)
    assert est.shape == (2, 32, K1, 6)
    # swap == reconstruct of the mixed sources
    est2 = s.reconstruct(pr2, c)
    np.testing.assert_array_equal(est, est2)

    est = s.posterior_sample(key, pr_mat, c, scale=0.5)
    assert est.shape == (2, 32, K1, 6)
    est = s.prior_sample(key, pr_mat, c, sample_rhy=True)
    assert est.shape == (2, 32, K1, 6)
    est = s.interp(pr_mat, c, pr2, c2, interp_chd=True, int_count=3)
    assert est.shape == (2, 3, 32, K1, 6)

    # interp against the functional API
    want = dv.interp(params, SMALL, jnp.asarray(pr_mat), jnp.asarray(c),
                     jnp.asarray(pr2), jnp.asarray(c2), interp_chd=True,
                     int_count=3)
    np.testing.assert_array_equal(est, want)


@pytest.mark.slow  # compiles several programs on the 8-device CPU mesh
def test_sampler_mesh_sharded_parity():
    """A ('data',)-mesh Sampler must produce the same outputs as the
    single-program Sampler (batch sharding is semantics-free; the workflows
    have no cross-sample dependency)."""
    from pctd_tpu.parallel import make_mesh

    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    single = Sampler(params, SMALL, frame_decoder="xla")
    mesh = make_mesh(8)
    sharded = Sampler(params, SMALL, frame_decoder="xla", mesh=mesh)

    x, c, pr_mat = random_batch(8, seed=60)
    x2, c2, pr2 = random_batch(8, seed=61)
    key = jax.random.PRNGKey(2)

    a = single.swap(pr_mat, pr2, c, c2, fix_rhy=False, fix_chd=True)
    b = sharded.swap(pr_mat, pr2, c, c2, fix_rhy=False, fix_chd=True)
    np.testing.assert_array_equal(a, b)

    # deterministic latents -> identical decode through the sharded path
    d_chd, d_rhy = single.encode(pr_mat, c)
    s_chd, s_rhy = sharded.encode(pr_mat, c)
    np.testing.assert_allclose(np.asarray(d_chd.mean),
                               np.asarray(s_chd.mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_rhy.std),
                               np.asarray(s_rhy.std), atol=1e-5)
    np.testing.assert_array_equal(single.decode(d_chd.mean, d_rhy.mean),
                                  sharded.decode(d_chd.mean, d_rhy.mean))

    with pytest.raises(ValueError):
        sharded.decode(np.zeros((6, SMALL.chd_z_dim)),
                       np.zeros((6, SMALL.txt_z_dim)))


@pytest.mark.slow  # compiles 6+ program shapes on the CPU mesh
def test_sampler_fixed_batch_parity():
    """fixed_batch pads/chunks to one compiled shape; outputs must equal the
    plain per-shape path for n < N, n == N and n > N (chunked)."""
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    plain = Sampler(params, SMALL, frame_decoder="xla")
    fixed = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4)

    for n in (2, 4, 7):
        x, c, pr_mat = random_batch(n, seed=70 + n)
        d_chd, d_rhy = plain.encode(pr_mat, c)
        f_chd, f_rhy = fixed.encode(pr_mat, c)
        np.testing.assert_allclose(np.asarray(d_chd.mean),
                                   np.asarray(f_chd.mean), atol=1e-5)
        np.testing.assert_array_equal(
            plain.decode(d_chd.mean, d_rhy.mean),
            fixed.decode(d_chd.mean, d_rhy.mean))

    # mesh + fixed_batch: divisibility enforced at construction
    from pctd_tpu.parallel import make_mesh
    with pytest.raises(ValueError):
        Sampler(params, SMALL, frame_decoder="xla", mesh=make_mesh(8),
                fixed_batch=12)
    both = Sampler(params, SMALL, frame_decoder="xla", mesh=make_mesh(8),
                   fixed_batch=8)
    x, c, pr_mat = random_batch(3, seed=80)
    d_chd, d_rhy = plain.encode(pr_mat, c)
    np.testing.assert_array_equal(plain.decode(d_chd.mean, d_rhy.mean),
                                  both.decode(d_chd.mean, d_rhy.mean))


def test_sampler_batch_guards():
    """Clear ValueErrors (not deep jit/shard_map traces) for empty batches
    and mesh-indivisible batches, on BOTH encode and decode."""
    from pctd_tpu.parallel import make_mesh

    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    s = Sampler(params, SMALL, frame_decoder="xla", mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        s.decode(np.zeros((6, SMALL.chd_z_dim)),
                 np.zeros((6, SMALL.txt_z_dim)))
    with pytest.raises(ValueError, match="not divisible"):
        s.encode(np.zeros((6, 32, 128), np.float32),
                 np.zeros((6, 8, 36), np.float32))
    f = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4)
    with pytest.raises(ValueError, match="empty batch"):
        f.decode(np.zeros((0, SMALL.chd_z_dim)),
                 np.zeros((0, SMALL.txt_z_dim)))


def test_sampler_auto_resolves_to_xla_off_tpu():
    """frame_decoder='auto' (the default) must resolve to the XLA path on a
    non-TPU backend instead of tripping interpret-mode Pallas."""
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    s = Sampler(params, SMALL)  # default: auto
    assert s.frame_decoder == "xla"
    x, c, pr_mat = random_batch(2, seed=52)
    est = s.reconstruct(pr_mat, c)
    assert est.shape == (2, 32, SMALL.pianotree.max_simu_note - 1, 6)


class _CompileBoom:
    """jit-like stand-in whose AOT compile probe fails (Mosaic/XLA compile
    error territory — the only condition that may degrade the chain)."""

    def __init__(self, backend):
        self.backend = backend

    def lower(self, *args):
        raise jax.errors.JaxRuntimeError(
            f"synthetic Mosaic failure in {self.backend}")


def test_sampler_auto_degrades_on_compile_failure():
    """The auto chain must walk pallas_full -> pallas -> xla on kernel
    COMPILE failures (VERDICT r2 item 7), mirroring Trainer's one-shot
    degrade. The failure is injected at the AOT lower/compile probe — the
    only place degrade is allowed (ADVICE r3)."""
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    s = Sampler(params, SMALL, frame_decoder="xla")
    real_build = s._build_decode
    built = []

    def fake_build(backend):
        built.append(backend)
        if backend == "xla":
            real_build(backend)
        else:
            s._decode = _CompileBoom(backend)
            s.frame_decoder = backend

    s._build_decode = fake_build
    s._chain = ["pallas_full", "pallas", "xla"]
    fake_build("pallas_full")

    zc = np.zeros((2, SMALL.chd_z_dim), np.float32)
    zr = np.zeros((2, SMALL.txt_z_dim), np.float32)
    with pytest.warns(UserWarning, match="degrading to"):
        est = s.decode(zc, zr)
    assert s.frame_decoder == "xla"
    assert built == ["pallas_full", "pallas", "xla"]
    assert est.shape == (2, 32, SMALL.pianotree.max_simu_note - 1, 6)


def test_sampler_explicit_backend_failure_raises():
    """An explicitly-requested backend must NOT silently degrade — the
    chain has length 1, so the compile error propagates."""
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    s = Sampler(params, SMALL, frame_decoder="xla")
    s._decode = _CompileBoom("xla")
    zc = np.zeros((2, SMALL.chd_z_dim), np.float32)
    zr = np.zeros((2, SMALL.txt_z_dim), np.float32)
    with pytest.raises(jax.errors.JaxRuntimeError):
        s.decode(zc, zr)


@pytest.mark.slow  # compiles encode+decode once for the export
def test_sampler_aot_export_preload_roundtrip(tmp_path):
    """export_aot serializes the compiled serving executables; a fresh
    sampler with aot_dir= preloads them (no recompile: the executable cache
    is populated before the first decode) and produces identical outputs.

    Runs with the persistent compilation cache ENABLED (as any serving
    process has it): serializing a cache-LOADED executable produces a bundle
    that fails at dispatch ("Function ... not found"), so export_aot must
    compile fresh with the cache bypassed — this test is order-independent
    regression cover for exactly that."""
    from pctd_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    src = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4)
    report = src.export_aot(str(tmp_path))
    assert {e["kind"] for e in report["exported"]} == {"decode", "encode"}
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["decode_xla_b4.jaxexe", "encode_b4.jaxexe",
                     "manifest.json"]
    # the manifest mirrors each bundle's meta (schema 2)
    from pctd_tpu.utils import aot as aot_mod
    man = aot_mod.read_manifest(str(tmp_path))
    assert set(man) == {"decode_xla_b4.jaxexe", "encode_b4.jaxexe"}
    assert man["decode_xla_b4.jaxexe"]["backend"] == "xla"

    dst = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4,
                  aot_dir=str(tmp_path))
    kinds = sorted(e["kind"] for e in dst.aot_report["loaded"])
    assert kinds == ["decode", "encode"]
    assert dst.aot_report["skipped"] == []
    assert ("xla", 4) in dst._compiled      # decode preloaded, not compiled
    assert 4 in dst._encode_aot

    x, c, pr_mat = random_batch(3, seed=90)
    np.testing.assert_array_equal(src.reconstruct(pr_mat, c),
                                  dst.reconstruct(pr_mat, c))

    # a real bundle relabeled to a backend outside the chain is rejected at
    # the chain check (recorded), not loaded into the decode cache
    import pickle
    alien_dir = tmp_path / "alien"
    alien_dir.mkdir()
    with open(tmp_path / "decode_xla_b4.jaxexe", "rb") as f:
        bundle = pickle.load(f)
    bundle["meta"]["backend"] = "pallas_full"
    with open(alien_dir / "decode_pallas_full_b4.jaxexe", "wb") as f:
        pickle.dump(bundle, f)
    s2 = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4,
                 aot_dir=str(alien_dir))
    assert s2.aot_report["loaded"] == []
    assert "not in this sampler's chain" in s2.aot_report["skipped"][0][1]

    # a bundle built for DIFFERENT model dims must be skipped at preload
    # (round-5 regression: a canonical-dims bundle preloaded into a tiny
    # config dispatched with mismatched avals and crashed the demo script)
    import dataclasses
    other = dataclasses.replace(SMALL, dec_time_hidden=64)
    p3 = dv.init_params(jax.random.PRNGKey(1), other)
    s3 = Sampler(p3, other, frame_decoder="xla", fixed_batch=4,
                 aot_dir=str(tmp_path))
    assert s3.aot_report["loaded"] == []
    reasons = " ".join(r for _, r in s3.aot_report["skipped"])
    assert "different model config" in reasons
    # and serving still works via normal compilation
    x, c, pr_mat = random_batch(2, seed=91)
    assert s3.reconstruct(pr_mat, c).shape[0] == 2

    # a fingerprint-LESS wrong-dims bundle (pre-cfg_fp export) slips past
    # preload but the dispatch-time aval check evicts it and recompiles
    nofp_dir = tmp_path / "nofp"
    nofp_dir.mkdir()
    with open(tmp_path / "decode_xla_b4.jaxexe", "rb") as f:
        bundle = pickle.load(f)
    del bundle["meta"]["cfg_fp"]
    with open(nofp_dir / "decode_xla_b4.jaxexe", "wb") as f:
        pickle.dump(bundle, f)
    s4 = Sampler(p3, other, frame_decoder="xla", fixed_batch=4,
                 aot_dir=str(nofp_dir))
    assert ("xla", 4) in s4._compiled          # preloaded (no fp to check)
    with pytest.warns(UserWarning, match="does not match this model"):
        out = s4.reconstruct(pr_mat, c)
    assert out.shape[0] == 2
    assert ("xla", 4) in s4._compiled          # replaced by a real compile


def test_sampler_aot_incompatible_bundles_skipped(tmp_path):
    """Runtime-mismatched and corrupt bundles must be SKIPPED with a recorded
    reason (preloading degrades to compilation; it never takes the daemon
    down)."""
    import pickle

    from pctd_tpu.utils import aot

    meta = aot.runtime_meta()
    stale = dict(meta, jax_version="0.0.0", kind="decode", backend="xla",
                 batch=4)
    with open(tmp_path / "stale.jaxexe", "wb") as f:
        pickle.dump({"meta": stale, "payload": (b"", None, None)}, f)
    (tmp_path / "corrupt.jaxexe").write_bytes(b"not a pickle")

    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    with pytest.warns(UserWarning, match="unreadable"):
        s = Sampler(params, SMALL, frame_decoder="xla", fixed_batch=4,
                    aot_dir=str(tmp_path))
    assert s.aot_report["loaded"] == []
    reasons = " ".join(r for _, r in s.aot_report["skipped"])
    assert "jax_version" in reasons          # stale runtime
    assert len(s.aot_report["skipped"]) == 2  # + the corrupt file
    # and the sampler still serves via normal compilation
    zc = np.zeros((2, SMALL.chd_z_dim), np.float32)
    zr = np.zeros((2, SMALL.txt_z_dim), np.float32)
    est = s.decode(zc, zr)
    assert est.shape == (2, 32, SMALL.pianotree.max_simu_note - 1, 6)


def test_sampler_runtime_error_reraises_without_degrade():
    """An EXECUTION-time failure (device OOM mid-serving, interrupt) must
    re-raise, not permanently downgrade the serving backend (ADVICE r3:
    compile probing isolates the two failure classes)."""
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    s = Sampler(params, SMALL, frame_decoder="xla")
    s._chain = ["xla", "xla-fallback-never-reached"]

    def exe_boom(params, zc, zr):
        raise jax.errors.JaxRuntimeError("synthetic RESOURCE_EXHAUSTED")

    class CompilesButDiesAtRun:
        def lower(self, *args):
            class L:
                def compile(self):
                    return exe_boom
            return L()

    s._decode = CompilesButDiesAtRun()
    zc = np.zeros((2, SMALL.chd_z_dim), np.float32)
    zr = np.zeros((2, SMALL.txt_z_dim), np.float32)
    with pytest.raises(jax.errors.JaxRuntimeError,
                       match="RESOURCE_EXHAUSTED"):
        s.decode(zc, zr)
    assert s.frame_decoder == "xla"  # chain position untouched
