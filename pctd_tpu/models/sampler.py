"""Serving sampler: pre-jitted, fixed-shape latent-control workflows.

The reference runs its four controllable-generation workflows as eager
per-call torch code (model.py:117-242). For production serving this wraps
them as compiled programs over fixed batch shapes: construct once, then every
``swap`` / ``posterior_sample`` / ``prior_sample`` / ``interp`` call is a
single device-side program (encode + decode fused), with the Pallas fused
frame decoder on the decode path by default.

Multi-chip serving: pass ``mesh`` (a 1-D ``('data',)`` mesh from
``pctd_tpu.parallel.make_mesh``) and every encode/decode batch is sharded
over axis 0 across the mesh via ``shard_map`` — the workflows are
embarrassingly batch-parallel (no cross-sample dependency), so throughput
scales with chip count over ICI with zero collectives on the hot path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.utils import host


#: ``frame_decoder="auto"`` tries these in order, degrading to the next on a
#: kernel compile failure (same one-shot pattern as Trainer._run_train_step;
#: all three backends are output-parity tested, so degrading only costs
#: speed, never correctness). The XLA path always compiles — the chain
#: cannot dead-end.
AUTO_CHAIN = ("pallas_full", "pallas", "xla")


class Sampler:
    """``fixed_batch=N`` turns on production-serving shape discipline: every
    encode/decode pads its batch up to N (zeros) and slices the result back,
    so requests of any size reuse ONE compiled program instead of paying a
    multi-minute TPU compile per new shape; batches larger than N run in
    N-sized chunks.

    ``frame_decoder="auto"`` (the default) picks the fastest available
    backend per device: jit defers kernel compilation to the first decode
    call, so the first call attempts ``pallas_full`` and degrades down
    :data:`AUTO_CHAIN` on Mosaic/XLA compile failure with a warning — a
    serving daemon on a chip where a fused kernel's layout doesn't lower
    (e.g. the round-2 B>=512 dur-bits store) serves slower instead of dying.
    """

    def __init__(self, params: dict, cfg: ModelConfig,
                 frame_decoder: str = "auto", mesh=None,
                 fixed_batch: Optional[int] = None,
                 aot_dir: Optional[str] = None):
        if fixed_batch is not None and mesh is not None \
                and fixed_batch % mesh.size:
            raise ValueError(f"fixed_batch {fixed_batch} not divisible by "
                             f"mesh size {mesh.size}")
        self.fixed_batch = fixed_batch
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        # model-config identity for AOT bundles: a compiled serving program
        # is weight-INDEPENDENT but shape-DEPENDENT — a bundle built for
        # other model dims would be dispatched with mismatched avals
        # (measured: a canonical-dims decode bundle preloaded into a tiny
        # test config raised at dispatch, round 5). Bundles carry this
        # fingerprint; preload_aot skips a mismatch.
        import dataclasses as _dc
        import hashlib as _hl
        import json as _json

        self._cfg_fp = _hl.sha256(_json.dumps(
            _dc.asdict(cfg), sort_keys=True, default=str).encode()
        ).hexdigest()[:12]
        if frame_decoder == "auto":
            if jax.devices()[0].platform == "tpu":
                self._chain = list(AUTO_CHAIN)
            else:
                # off-TPU the fused kernels only run in interpret mode
                # (test-only, orders of magnitude slower) — serving there
                # means the XLA path, directly
                self._chain = ["xla"]
        else:
            self._chain = [frame_decoder]
        self.frame_decoder = self._chain[0]
        #: (backend, batch) -> AOT-compiled decode executable. Compilation
        #: is probed explicitly (lower().compile()) so only genuine COMPILE
        #: failures degrade the backend chain; an execution-time error (OOM
        #: mid-serving, interrupt) re-raises instead of permanently
        #: downgrading the daemon (ADVICE r3).
        self._compiled: dict = {}
        #: batch -> AOT-preloaded encode executable (dt_x=None convention)
        self._encode_aot: dict = {}
        self.aot_report: Optional[dict] = None
        self._build_decode(self.frame_decoder)

        def enc_fn(params, pr_mat, c, dt_x):
            return dv.encode(params, cfg, pr_mat, c, dt_x)

        if mesh is None:
            self._encode = jax.jit(partial(dv.encode, cfg=cfg))
        else:
            from jax.sharding import PartitionSpec as P

            from pctd_tpu.parallel.mesh import shard_map

            data = P(tuple(mesh.axis_names))
            self._encode_sharded = jax.jit(shard_map(
                enc_fn, mesh=mesh, in_specs=(P(), data, data, data),
                out_specs=data, check_vma=False))
            # dt_x=None changes the pytree; plain variant for the common path
            self._encode = jax.jit(shard_map(
                lambda params, pr_mat, c: enc_fn(params, pr_mat, c, None),
                mesh=mesh, in_specs=(P(), data, data), out_specs=data,
                check_vma=False))

        if aot_dir is not None:
            self.aot_report = self.preload_aot(aot_dir)

    def _build_decode(self, backend: str):
        cfg = self.cfg
        if backend == "xla" and cfg.unroll_dur == 1:
            # serving default: unrolled dur chain measures ~10% faster at
            # B=128 (47.9 vs 52.9 ms/batch) with identical outputs
            import dataclasses

            cfg = dataclasses.replace(cfg, unroll_dur=5)

        def dec_fn(params, z_chd, z_rhy):
            return dv.decode_z(params, cfg=cfg, z_chd=z_chd, z_rhy=z_rhy,
                               frame_decoder=backend)

        if self.mesh is None:
            self._decode = jax.jit(dec_fn)
        else:
            from jax.sharding import PartitionSpec as P

            from pctd_tpu.parallel.mesh import shard_map

            data = P(tuple(self.mesh.axis_names))
            self._decode = jax.jit(shard_map(
                dec_fn, mesh=self.mesh, in_specs=(P(), data, data),
                out_specs=data, check_vma=False))
        self.frame_decoder = backend

    def _compiled_decode(self, zc, zr):
        """AOT-compiled decode executable for this batch shape, degrading
        down the backend chain ONLY on trace/compile failure (the
        lower().compile() probe isolates compilation from execution, so a
        runtime error in the actual call re-raises to the caller — it is
        not evidence the backend cannot compile)."""
        while True:
            key = (self.frame_decoder, zc.shape[0])
            exe = self._compiled.get(key)
            if exe is not None:
                return exe
            try:
                exe = self._decode.lower(self.params, zc, zr).compile()
            except Exception as e:  # lowering (Mosaic) or XLA compile error
                idx = self._chain.index(self.frame_decoder)
                if idx + 1 >= len(self._chain):
                    raise
                import warnings

                nxt = self._chain[idx + 1]
                warnings.warn(
                    f"frame decoder '{self.frame_decoder}' failed to "
                    f"compile on this device ({type(e).__name__}: "
                    f"{str(e)[:200]}); degrading to '{nxt}' "
                    "(output-parity tested, slower)")
                self._build_decode(nxt)
                continue
            self._compiled[key] = exe
            return exe

    def _decode_degrading(self, zc, zr):
        """One decode call: compile (with backend degrade) then execute
        (execution errors propagate — EXCEPT an argument-aval mismatch,
        which means a preloaded bundle without a cfg_fp was built for other
        model dims: evict it and compile the real program)."""
        exe = self._compiled_decode(zc, zr)
        try:
            return exe(self.params, zc, zr)
        except TypeError as e:
            if "compiled" not in str(e):
                raise
            import warnings

            warnings.warn("preloaded decode bundle does not match this "
                          "model's shapes; recompiling "
                          f"({str(e)[:150]})")
            self._compiled.pop((self.frame_decoder, zc.shape[0]), None)
            return self._compiled_decode(zc, zr)(self.params, zc, zr)

    # -- core ------------------------------------------------------------------

    def _check_batch(self, n: int):
        if n == 0:
            raise ValueError("empty batch")
        if (self.mesh is not None and self.fixed_batch is None
                and n % self.mesh.size):
            raise ValueError(
                f"batch {n} not divisible by mesh size {self.mesh.size}")

    def _chunked(self, fn, *arrays):
        """Run ``fn`` over fixed_batch-sized zero-padded chunks of the
        arrays (axis 0) and concatenate the un-padded results."""
        n = arrays[0].shape[0]
        fb = self.fixed_batch
        if fb is None:
            return fn(*arrays)
        outs = []
        for lo in range(0, n, fb):
            take = min(fb, n - lo)
            chunk = [jnp.concatenate(
                [a[lo:lo + take],
                 jnp.zeros((fb - take,) + a.shape[1:], a.dtype)])
                if take < fb else a[lo:lo + fb] for a in arrays]
            out = fn(*chunk)
            outs.append(jax.tree_util.tree_map(lambda t: t[:take], out))
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *ts: jnp.concatenate(ts, axis=0), *outs)

    def _encode_call(self, pm, cc, dd=None):
        """One encode program call, preferring an AOT-preloaded executable
        when one matches this (batch, dt_x=None) shape; an aval mismatch
        (fingerprint-less bundle from other model dims) evicts + recompiles."""
        if dd is None:
            exe = self._encode_aot.get(int(pm.shape[0]))
            if exe is not None:
                try:
                    return exe(self.params, pr_mat=pm, c=cc, dt_x=None)
                except TypeError as e:
                    if "compiled" not in str(e):
                        raise
                    import warnings

                    warnings.warn("preloaded encode bundle does not match "
                                  "this model's shapes; recompiling")
                    self._encode_aot.pop(int(pm.shape[0]), None)
        return self._encode(self.params, pr_mat=pm, c=cc, dt_x=dd)

    def encode(self, pr_mat, c, dt_x=None):
        pr_mat, c = jnp.asarray(pr_mat), jnp.asarray(c)
        self._check_batch(pr_mat.shape[0])
        if self.mesh is None and self.fixed_batch is None:
            return self._encode_call(pr_mat, c,
                                     None if dt_x is None
                                     else jnp.asarray(dt_x))
        if self.mesh is None:
            f = self._encode_call
        elif dt_x is None:
            f = lambda pm, cc: self._encode(self.params, pm, cc)
        else:
            f = lambda pm, cc, dd: self._encode_sharded(self.params, pm,
                                                        cc, dd)
        args = (pr_mat, c) if dt_x is None else (pr_mat, c,
                                                 jnp.asarray(dt_x))
        return self._chunked(f, *args)

    def decode(self, z_chd, z_rhy) -> np.ndarray:
        z_chd, z_rhy = jnp.asarray(z_chd), jnp.asarray(z_rhy)
        self._check_batch(z_chd.shape[0])
        # host.fetch_np: the Pallas decode grid carries the Mosaic custom
        # call's tiled layout; a direct np.asarray de-tiles through the
        # transfer path at ~4 KB/s (minutes per grid — utils/host.py)
        return host.fetch_np(self._chunked(self._decode_degrading,
                                           z_chd, z_rhy))

    def reconstruct(self, pr_mat, c, sample: bool = False,
                    key: Optional[jax.Array] = None) -> np.ndarray:
        d_chd, d_rhy = self.encode(pr_mat, c)
        if sample:
            k1, k2 = jax.random.split(key)
            return self.decode(d_chd.rsample(k1), d_rhy.rsample(k2))
        return self.decode(d_chd.mean, d_rhy.mean)

    # -- AOT serving bundles -----------------------------------------------------

    def export_aot(self, out_dir: str, batches=None) -> dict:
        """Compile the serving programs for ``batches`` and serialize the
        finished executables (incl. Mosaic kernel binaries) to
        ``out_dir/*.jaxexe`` via ``jax.experimental.serialize_executable``.

        A daemon started with ``aot_dir=out_dir`` on a matching runtime
        (same jax version / platform / device kind / device count) then
        skips the 100-660 s per-shape Mosaic/XLA compile entirely
        (VERDICT r3 item 2 — the reference's eager torch serving,
        model.py:117-143, never compiles; this is the compiled-runtime
        answer). Decode is exported for the CURRENT backend (after any
        degrade); encode is exported for single-chip samplers (the mesh
        encode program embeds the mesh — recompiling it is cheap XLA, not
        Mosaic). Returns a report with per-program compile seconds.
        """
        import os
        import time

        from pctd_tpu.utils import aot

        if batches is None:
            if self.fixed_batch is None:
                raise ValueError(
                    "export_aot needs explicit `batches` when the sampler "
                    "has no fixed_batch")
            batches = [self.fixed_batch]
        cfg = self.cfg
        report = {"dir": out_dir, "exported": [], "meta": aot.runtime_meta()}
        for b in batches:
            zc = jnp.zeros((b, cfg.chd_z_dim), jnp.float32)
            zr = jnp.zeros((b, cfg.txt_z_dim), jnp.float32)
            t0 = time.perf_counter()
            exe = self._fresh_compile(
                self._decode.lower(self.params, zc, zr))
            self._compiled[(self.frame_decoder, b)] = exe
            path = os.path.join(
                out_dir, f"decode_{self.frame_decoder}_b{b}.jaxexe")
            aot.save_exe(exe, path, kind="decode",
                         backend=self.frame_decoder, batch=b,
                         cfg_fp=self._cfg_fp)
            report["exported"].append(
                {"kind": "decode", "backend": self.frame_decoder,
                 "batch": b, "path": path,
                 "compile_s": round(time.perf_counter() - t0, 1)})
            if self.mesh is not None:
                continue
            pm = jnp.zeros((b, cfg.pianotree.num_step, 128), jnp.float32)
            cc = jnp.zeros((b, cfg.chord.num_step, cfg.chord.dim),
                           jnp.float32)
            t0 = time.perf_counter()
            enc = self._fresh_compile(
                self._encode.lower(self.params, pr_mat=pm, c=cc, dt_x=None))
            self._encode_aot[b] = enc
            path = os.path.join(out_dir, f"encode_b{b}.jaxexe")
            aot.save_exe(enc, path, kind="encode", batch=b,
                         cfg_fp=self._cfg_fp)
            report["exported"].append(
                {"kind": "encode", "batch": b, "path": path,
                 "compile_s": round(time.perf_counter() - t0, 1)})
        return report

    @staticmethod
    def _fresh_compile(lowered):
        """Compile BYPASSING the persistent compilation cache: an executable
        the runtime loaded from the on-disk cache serializes to a broken
        bundle (serialize succeeds, dispatch later fails with "Function ...
        not found"), so export must always serialize a genuine fresh build.
        Export pays a full compile; that is the deploy-time cost this
        feature exists to move OFF the serving daemon's start.

        Flipping ``jax_enable_compilation_cache`` alone is NOT enough:
        ``compilation_cache.is_cache_used`` memoizes its answer once per
        process, so after any cached compile the flag flip is ignored and
        the "fresh" build still comes from disk. ``reset_cache()`` clears
        that memo (both around the compile and after restoring the flag,
        so later compiles re-arm the cache)."""
        import jax
        from jax.experimental.compilation_cache import (
            compilation_cache as cc)

        old = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        cc.reset_cache()  # drop the per-process is_cache_used memo
        try:
            return lowered.compile()
        finally:
            jax.config.update("jax_enable_compilation_cache", old)
            cc.reset_cache()  # re-arm for subsequent cached compiles

    def preload_aot(self, aot_dir: str) -> dict:
        """Load every compatible ``*.jaxexe`` bundle under ``aot_dir`` into
        this sampler's executable caches (see :meth:`export_aot`).

        Incompatible/unreadable bundles are skipped with the reason recorded
        — preloading degrades to normal compilation, it never takes the
        daemon down. When a decode bundle's backend sits EARLIER in the
        degrade chain than the current one, the sampler upgrades to it (the
        executable is already compiled, so the usual compile-failure risk
        that drives degradation does not exist).
        """
        from pctd_tpu.utils import aot

        loaded, skipped = aot.load_dir(aot_dir, kinds=("decode", "encode"))
        report = {"dir": aot_dir, "loaded": [],
                  "skipped": [list(s) for s in skipped]}
        for exe, meta in loaded:
            kind = meta.get("kind")
            b = int(meta.get("batch", 0))
            if meta.get("cfg_fp") and meta["cfg_fp"] != self._cfg_fp:
                report["skipped"].append(
                    [f"{kind}_b{b}", "built for a different model config "
                     f"(cfg_fp {meta['cfg_fp']} != {self._cfg_fp})"])
                continue
            if kind == "decode":
                backend = meta.get("backend")
                if backend not in self._chain:
                    report["skipped"].append(
                        [f"decode_{backend}_b{b}",
                         f"backend {backend!r} not in this sampler's chain "
                         f"{self._chain}"])
                    continue
                self._compiled[(backend, b)] = exe
                if (self._chain.index(backend)
                        < self._chain.index(self.frame_decoder)):
                    self._build_decode(backend)
                report["loaded"].append(
                    {"kind": "decode", "backend": backend, "batch": b})
            elif kind == "encode":
                if self.mesh is not None:
                    report["skipped"].append(
                        [f"encode_b{b}", "mesh sampler recompiles encode "
                         "(program embeds the mesh)"])
                    continue
                self._encode_aot[b] = exe
                report["loaded"].append({"kind": "encode", "batch": b})
        return report

    # -- the four workflows ------------------------------------------------------

    def swap(self, pr_mat1, pr_mat2, c1, c2, fix_rhy: bool, fix_chd: bool
             ) -> np.ndarray:
        """Compositional style transfer (reference model.py:145-149)."""
        pr_mat = pr_mat1 if fix_rhy else pr_mat2
        c = c1 if fix_chd else c2
        return self.reconstruct(pr_mat, c, sample=False)

    def posterior_sample(self, key, pr_mat, c, scale: Optional[float] = None,
                         sample_chd: bool = True, sample_txt: bool = True
                         ) -> np.ndarray:
        """Texture variation (reference model.py:151-172)."""
        d_chd, d_rhy = self.encode(pr_mat, c)
        if scale is not None:
            d_chd = d_chd._replace(std=d_chd.std * scale)
            d_rhy = d_rhy._replace(std=d_rhy.std * scale)
        k1, k2 = jax.random.split(key)
        z_chd = d_chd.rsample(k1) if sample_chd else d_chd.mean
        z_rhy = d_rhy.rsample(k2) if sample_txt else d_rhy.mean
        return self.decode(z_chd, z_rhy)

    def prior_sample(self, key, pr_mat, c, sample_chd: bool = False,
                     sample_rhy: bool = False, scale: float = 1.0
                     ) -> np.ndarray:
        """Prior replacement (reference model.py:174-184)."""
        d_chd, d_rhy = self.encode(pr_mat, c)
        k1, k2 = jax.random.split(key)
        z_chd = (jax.random.normal(k1, d_chd.mean.shape) * scale
                 if sample_chd else d_chd.rsample(k1))
        z_rhy = (jax.random.normal(k2, d_rhy.mean.shape) * scale
                 if sample_rhy else d_rhy.rsample(k2))
        return self.decode(z_chd, z_rhy)

    def interp(self, pr_mat1, c1, pr_mat2, c2, interp_chd: bool = False,
               interp_rhy: bool = False, int_count: int = 10) -> np.ndarray:
        """Chord/texture SLERP interpolation (reference model.py:190-242)."""
        d_chd1, d_rhy1 = self.encode(pr_mat1, c1)
        d_chd2, d_rhy2 = self.encode(pr_mat2, c2)
        zc1, zr1 = np.asarray(d_chd1.mean), np.asarray(d_rhy1.mean)
        zc2, zr2 = np.asarray(d_chd2.mean), np.asarray(d_rhy2.mean)
        B = zc1.shape[0]
        if interp_chd:
            zcs = np.stack([dv.interp_path(a, b, int_count)
                            for a, b in zip(zc1, zc2)])
        else:
            zcs = np.repeat(zc1[:, None], int_count, axis=1)
        if interp_rhy:
            zrs = np.stack([dv.interp_path(a, b, int_count)
                            for a, b in zip(zr1, zr2)])
        else:
            zrs = np.repeat(zr1[:, None], int_count, axis=1)
        est = self.decode(zcs.reshape(B * int_count, -1),
                          zrs.reshape(B * int_count, -1))
        spec = self.cfg.pianotree
        return est.reshape(B, int_count, spec.num_step,
                           spec.max_simu_note - 1, 6)
