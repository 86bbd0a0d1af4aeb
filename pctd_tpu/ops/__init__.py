from pctd_tpu.ops.gru import (  # noqa: F401
    GRUParams,
    gru_init,
    gru_cell,
    gru_cell_pre,
    gru_gates_pre,
    input_proj,
    gru_scan,
    bigru_last,
    bigru_last_masked,
)
from pctd_tpu.ops.distributions import DiagNormal, kl_std_normal  # noqa: F401
from pctd_tpu.ops.losses import (  # noqa: F401
    cross_entropy_ignore,
    cross_entropy_mean,
)
