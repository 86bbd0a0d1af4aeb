from pctd_tpu.ops.pallas.ar_decoder import frame_decode_pallas  # noqa: F401
from pctd_tpu.ops.pallas.full_decoder import decode_grid_fused  # noqa: F401
