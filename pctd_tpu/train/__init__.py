from pctd_tpu.train import schedules, trainer, logging  # noqa: F401
