from pctd_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    make_parallel_train_step,
    make_parallel_eval_step,
)
