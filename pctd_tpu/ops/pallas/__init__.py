from pctd_tpu.ops.pallas.ar_decoder import frame_decode_pallas  # noqa: F401
