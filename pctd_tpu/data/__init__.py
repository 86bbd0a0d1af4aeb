from pctd_tpu.data import converter, tensorize, detrend  # noqa: F401
