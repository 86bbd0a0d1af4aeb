"""Device-derived memory envelopes (VERDICT r2 item 6).

The auto-accum HBM envelope and the seq-kernel VMEM block caps were
measured on a 16 GiB / 128 MiB-VMEM v5e; these tests pin the scaling
contract: measured device -> unchanged constants, bigger device -> larger
envelopes, smaller device -> smaller, env override always wins (it is also
how the tests inject device sizes without real hardware).
"""
import dataclasses

import pytest

from pctd_tpu.config import ModelConfig, TrainConfig
from pctd_tpu.utils import device_mem

GiB = 1024 ** 3
MiB = 1024 ** 2


@pytest.fixture
def mem_env(monkeypatch):
    def set_mem(hbm=None, vmem=None):
        if hbm is not None:
            monkeypatch.setenv("PCTD_HBM_BYTES", str(hbm))
        if vmem is not None:
            monkeypatch.setenv("PCTD_VMEM_BYTES", str(vmem))
    return set_mem


def test_env_override_wins(mem_env):
    mem_env(hbm=7 * GiB, vmem=32 * MiB)
    assert device_mem.hbm_bytes() == 7 * GiB
    assert device_mem.vmem_bytes() == 32 * MiB


def test_scale_by_hbm(mem_env):
    mem_env(hbm=device_mem.MEASURED_HBM)
    assert device_mem.scale_by_hbm(2048) == 2048  # measured chip: unchanged
    mem_env(hbm=32 * GiB)
    assert device_mem.scale_by_hbm(2048) == 4096  # 2x HBM -> 2x envelope
    mem_env(hbm=8 * GiB)
    assert device_mem.scale_by_hbm(2048) == 1024
    mem_env(hbm=1 * GiB)
    assert device_mem.scale_by_hbm(2048) == 128   # floor


def test_scale_by_vmem_power_of_two(mem_env):
    mem_env(vmem=device_mem.MEASURED_VMEM)
    assert device_mem.scale_by_vmem(256) == 256   # measured chip: unchanged
    mem_env(vmem=64 * MiB)
    assert device_mem.scale_by_vmem(256) == 128
    mem_env(vmem=48 * MiB)                         # non-power ratio rounds
    assert device_mem.scale_by_vmem(256) == 64    # down to a power of two
    mem_env(vmem=4 * MiB)
    assert device_mem.scale_by_vmem(256) == 32    # floor
    mem_env(vmem=256 * MiB)
    assert device_mem.scale_by_vmem(256) == 512


def test_kind_table_fallback():
    class FakeDev:
        device_kind = "TPU v4"

        def memory_stats(self):
            return None  # the remote-tunnel case

    assert device_mem.hbm_bytes(FakeDev()) == 32 * GiB
    assert device_mem.vmem_bytes(FakeDev()) == 128 * MiB

    class Unknown:
        device_kind = "TPU v9 hyperpod"

        def memory_stats(self):
            return None

    # v9 matches no marker -> HBM unknown, VMEM falls back to measured
    assert device_mem.hbm_bytes(Unknown()) is None
    assert device_mem.vmem_bytes(Unknown()) == device_mem.MEASURED_VMEM


def test_kind_table_beats_reserved_bytes_limit():
    # Known kinds use the published table: runtimes report a
    # reserved-adjusted bytes_limit below the published HBM, which would
    # silently shrink the measured envelope (ADVICE r3) — the envelope was
    # measured under the same reservation, so the table is the right basis.
    class Dev:
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            return {"bytes_limit": 15 * GiB}  # 16 GiB minus reservation

    assert device_mem.hbm_bytes(Dev()) == 16 * GiB

    class UnknownWithStats:
        device_kind = "TPU v9 hyperpod"

        def memory_stats(self):
            return {"bytes_limit": 12 * GiB}

    # unknown kind: the runtime report is the only signal — use it
    assert device_mem.hbm_bytes(UnknownWithStats()) == 12 * GiB


def test_auto_accum_scales_with_hbm(mem_env):
    from pctd_tpu.train.trainer import auto_accum_steps

    mcfg = dataclasses.replace(ModelConfig(), remat_frames=True)
    # measured 16G chip: B=4096 -> 2 microbatches (the BENCH config)
    mem_env(hbm=16 * GiB)
    assert auto_accum_steps(mcfg, TrainConfig(batch_size=4096,
                                              accum_steps=0)) == 2
    # 32G chip: B=4096 fits one step
    mem_env(hbm=32 * GiB)
    assert auto_accum_steps(mcfg, TrainConfig(batch_size=4096,
                                              accum_steps=0)) == 1
    # 8G chip: envelope halves -> 4 microbatches
    mem_env(hbm=8 * GiB)
    assert auto_accum_steps(mcfg, TrainConfig(batch_size=4096,
                                              accum_steps=0)) == 4
    # explicit accum_steps always wins
    assert auto_accum_steps(mcfg, TrainConfig(batch_size=4096,
                                              accum_steps=3)) == 3
