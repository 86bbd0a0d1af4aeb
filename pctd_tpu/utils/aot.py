"""AOT-serialized serving executables: ship compiled programs, not sources.

The serving decode program costs 100-660 s of Mosaic/XLA compile per
(backend, batch) shape on a cold cache (BENCH_r03), and the persistent
compile cache only helps while the package sources are byte-identical. For
production serving (`scripts/serve.py`) that is an unacceptable cold-start:
the reference's eager torch serving flow (reference model.py:117-143) starts
instantly because it never compiles. This module closes that gap the TPU
way: `jax.experimental.serialize_executable` freezes the fully-compiled
executable (including Mosaic kernel binaries) to a file, and a daemon
preloads it in seconds.

Bundle format: one pickle per program —
    {"meta": {schema, jax_version, platform, device_kind, num_devices,
              kind ("decode"|"encode"), backend, batch, extra...},
     "payload": (serialized_bytes, in_tree, out_tree)}

Compatibility is enforced on load: jax version, platform, device kind and
device count must match the serializing host (a compiled TPU program is
device-kind specific); a mismatch SKIPS the file (reported, never fatal) and
the caller falls back to normal compilation. The unpickler is restricted to
the jax/numpy/stdlib modules an executable payload legitimately references.
"""
from __future__ import annotations

import io
import os
import pickle
import warnings
from typing import Optional, Tuple

SCHEMA = 1

#: module prefixes a serialized-executable pickle may legitimately reference
#: (restricted unpickler: an AOT bundle is a local artifact, but serving
#: daemons load it on start — keep the attack surface to the jax stack).
_SAFE_MODULE_PREFIXES = (
    "jax", "jaxlib", "numpy", "builtins", "collections", "functools",
    "pickle", "pctd_tpu",  # our own pytree node types ride the out_tree
)


class AotMismatch(RuntimeError):
    """Bundle is valid but was built for a different runtime/device."""


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if not module.startswith(_SAFE_MODULE_PREFIXES):
            raise pickle.UnpicklingError(
                f"AOT bundle references disallowed module {module!r}")
        return super().find_class(module, name)


def _loads(blob: bytes):
    return _RestrictedUnpickler(io.BytesIO(blob)).load()


def runtime_meta() -> dict:
    """The compatibility fingerprint of this process's runtime + devices."""
    import jax

    devs = jax.devices()
    return {
        "schema": SCHEMA,
        "jax_version": jax.__version__,
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "num_devices": len(devs),
    }


def save_exe(exe, path: str, **extra) -> dict:
    """Serialize a `jax.stages.Compiled` to ``path``; returns its meta."""
    from jax.experimental import serialize_executable as se

    meta = dict(runtime_meta(), **extra)
    try:
        # the device ids this program was compiled against — load must
        # reconstruct EXACTLY this execution-device list (deserialize's
        # default is ALL local devices, which turns a 1-device serving
        # program into an N-shard program on multi-device hosts)
        meta["exe_device_ids"] = [
            d.id for d in exe._executable.xla_executable.local_devices()]
    except AttributeError:
        meta["exe_device_ids"] = None
    payload = se.serialize(exe)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"meta": meta, "payload": payload}, f)
    os.replace(tmp, path)
    return meta


def peek_meta(path: str) -> dict:
    with open(path, "rb") as f:
        return _loads(f.read())["meta"]


def load_exe(path: str, strict_keys: Tuple[str, ...] = (
        "schema", "jax_version", "platform", "device_kind", "num_devices")):
    """Load + deserialize one bundle; returns (loaded_callable, meta).

    Raises :class:`AotMismatch` when any ``strict_keys`` entry differs from
    this runtime (callers treat that as "recompile instead", not an error).
    """
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        bundle = _loads(f.read())
    meta, payload = bundle["meta"], bundle["payload"]
    here = runtime_meta()
    for k in strict_keys:
        if meta.get(k) != here.get(k):
            raise AotMismatch(
                f"{os.path.basename(path)}: {k}={meta.get(k)!r} but this "
                f"runtime has {here.get(k)!r}")
    execution_devices = None
    if meta.get("exe_device_ids") is not None:
        import jax

        by_id = {d.id: d for d in jax.devices()}
        try:
            execution_devices = [by_id[i] for i in meta["exe_device_ids"]]
        except KeyError as e:
            raise AotMismatch(
                f"{os.path.basename(path)}: compiled for device id {e} "
                f"absent from this host") from None
    return se.deserialize_and_load(
        *payload, execution_devices=execution_devices), meta


def load_dir(aot_dir: str, kind: Optional[str] = None) -> Tuple[list, list]:
    """Load every ``*.jaxexe`` bundle under ``aot_dir``.

    Returns (loaded, skipped): loaded = [(loaded_callable, meta)], skipped =
    [(filename, reason)]. Unreadable/incompatible files are skipped with the
    reason recorded — preloading must never take a serving daemon down.
    """
    loaded, skipped = [], []
    if not os.path.isdir(aot_dir):
        return loaded, [(aot_dir, "not a directory")]
    for name in sorted(os.listdir(aot_dir)):
        if not name.endswith(".jaxexe"):
            continue
        path = os.path.join(aot_dir, name)
        try:
            exe, meta = load_exe(path)
        except AotMismatch as e:
            skipped.append((name, str(e)))
            continue
        except Exception as e:  # corrupt file, pickle error, ...
            warnings.warn(f"AOT bundle {name} unreadable: "
                          f"{type(e).__name__}: {e}")
            skipped.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
            continue
        if kind is not None and meta.get("kind") != kind:
            continue
        loaded.append((exe, meta))
    return loaded, skipped
