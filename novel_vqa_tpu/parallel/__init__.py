from novel_vqa_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    make_dp_train_step,
    make_dp_eval_step,
    shard_batch_arrays,
)
