from pctd_tpu.utils import init  # noqa: F401
