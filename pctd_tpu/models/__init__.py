from pctd_tpu.models import chord_encoder, texture_encoder  # noqa: F401
from pctd_tpu.models import chord_decoder, pianotree_decoder  # noqa: F401
from pctd_tpu.models import disentangle_vae  # noqa: F401
