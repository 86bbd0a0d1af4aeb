"""Device memory introspection: HBM/VMEM budgets with graceful fallbacks.

The trainer's auto-accum envelope and the fused kernels' VMEM block caps
were measured on a 16 GiB-HBM / 128 MiB-VMEM v5e. A different-memory chip
should scale those, not inherit them (VERDICT r2 item 6: a bigger-HBM chip
was underutilized, a smaller one OOM'd into the degrade path). Resolution
order per quantity:

1. explicit env override (``PCTD_HBM_BYTES`` / ``PCTD_VMEM_BYTES``) — the
   escape hatch for devices this table predates;
2. a device-kind table of published per-device budgets — preferred for
   KNOWN kinds, because runtimes commonly report a reserved-adjusted
   ``bytes_limit`` slightly below the published HBM, which would silently
   shrink the measured auto-accum envelope (2048 -> 1920 on a v5e with a
   5% reservation) even though the envelope was measured under the same
   reservation (ADVICE r3);
3. ``device.memory_stats()['bytes_limit']`` for HBM on kinds the table
   does not know (unavailable through some remote-TPU tunnels, where it
   returns None);
4. the measured v5e constants (i.e. today's behavior, unchanged).

VMEM has no runtime query API, so it resolves 1 -> 3 -> 4 only.
"""
from __future__ import annotations

import os
from typing import Optional

GiB = 1024 ** 3
MiB = 1024 ** 2

#: Published HBM per JAX device (v2/v3 expose one device per core, two
#: cores per chip; v4+ are megacore = one device per chip).
_HBM_BY_KIND = (
    ("v6", 32 * GiB),           # Trillium / v6e
    ("v5p", 95 * GiB),
    ("v5 lite", 16 * GiB),      # v5e reports device_kind "TPU v5 lite"
    ("v5litepod", 16 * GiB),
    ("v5e", 16 * GiB),
    ("v5", 95 * GiB),           # bare "TPU v5" = v5p
    ("v4", 32 * GiB),
    ("v3", 16 * GiB),
    ("v2", 8 * GiB),
)

#: VMEM per core. All currently-shipping generations expose the same
#: 128 MiB scoped-VMEM ceiling the kernels were tuned against (the
#: ``vmem_limit_bytes=128 MiB`` compiles on v5e were measured to the byte);
#: the table exists so a future divergent generation has one place to land.
_VMEM_BY_KIND = (
    ("v6", 128 * MiB),
    ("v5", 128 * MiB),
    ("v4", 128 * MiB),
    ("v3", 16 * MiB),
    ("v2", 16 * MiB),
)

#: The chip the constants in trainer.py / ops/pallas were measured on.
MEASURED_HBM = 16 * GiB
MEASURED_VMEM = 128 * MiB


def _kind(device=None) -> str:
    if device is None:
        try:
            import jax

            device = jax.local_devices()[0]
        except Exception:  # noqa: BLE001 — no backend reachable
            return ""
    return str(getattr(device, "device_kind", "")).lower()


def hbm_bytes(device=None) -> Optional[int]:
    """Usable HBM of the (first local) device, or None if unknowable."""
    env = os.environ.get("PCTD_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        d = device if device is not None else jax.local_devices()[0]
    except Exception:  # noqa: BLE001
        return None
    kind = _kind(d)
    for marker, size in _HBM_BY_KIND:
        if marker in kind:
            return size
    try:
        stats = d.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 — tunnel backends raise/return None
        pass
    return None


def vmem_bytes(device=None) -> int:
    """Scoped-VMEM ceiling of the device; MEASURED_VMEM when unknown."""
    env = os.environ.get("PCTD_VMEM_BYTES")
    if env:
        return int(env)
    kind = _kind(device)
    for marker, size in _VMEM_BY_KIND:
        if marker in kind:
            return size
    return MEASURED_VMEM


def scale_by_hbm(base: int, device=None, granularity: int = 128,
                 floor: int = 128) -> int:
    """Scale a batch envelope measured on MEASURED_HBM to this device's HBM
    (linear: activation memory dominates and is batch-proportional), rounded
    down to ``granularity``. Unknown HBM -> ``base`` unchanged."""
    hbm = hbm_bytes(device)
    if hbm is None or hbm == MEASURED_HBM:
        return base
    scaled = int(base * (hbm / MEASURED_HBM))
    return max(floor, (scaled // granularity) * granularity)


def scale_by_vmem(base_cap: int, device=None, floor: int = 32) -> int:
    """Scale a kernel block-row cap measured at MEASURED_VMEM to this
    device's VMEM, rounded down to a power of two (Mosaic block shapes want
    the 8-row sublane multiple; powers of two keep every divisor chain in
    the pickers valid). Same-or-unknown VMEM -> ``base_cap`` unchanged."""
    vmem = vmem_bytes(device)
    if vmem == MEASURED_VMEM:
        return base_cap
    scaled = int(base_cap * (vmem / MEASURED_VMEM))
    if scaled < floor:
        return floor
    p = 1
    while p * 2 <= scaled:
        p *= 2
    return p
