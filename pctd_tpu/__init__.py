"""pctd_tpu — TPU-native polyphonic chord/texture disentanglement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ISMIR'20
"Learning Interpretable Representation for Controllable Polyphonic Music
Generation" system (reference: ZZWaang/polyphonic-chord-texture-disentanglement).

Layout
------
- ``pctd_tpu.ops``      low-level compute: scan GRUs, distributions, losses
- ``pctd_tpu.models``   chord/texture encoders, chord decoder, PianoTree decoder,
                        and the DisentangleVAE composition + latent-control API
- ``pctd_tpu.data``     symbolic-music substrate: note matrices, piano rolls,
                        on-device tensorization, MIDI I/O, datasets
- ``pctd_tpu.train``    schedules, jitted train/eval steps, checkpointing, logging
- ``pctd_tpu.parallel`` device mesh + data-parallel sharding
- ``pctd_tpu.utils``    RNG / init helpers
"""

__version__ = "0.1.0"

from pctd_tpu.config import ModelConfig, TrainConfig, DataConfig  # noqa: F401
