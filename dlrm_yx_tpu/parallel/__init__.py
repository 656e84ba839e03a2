from dlrm_yx_tpu.parallel.sharders import shard, register_sharder, get_splits
from dlrm_yx_tpu.parallel.plan import ShardingPlan, make_plan
from dlrm_yx_tpu.parallel.mesh import make_mesh
from dlrm_yx_tpu.parallel.hybrid import (
    make_hybrid_train_step,
    make_hybrid_eval_step,
    init_hybrid_params,
    init_hybrid_opt_state,
    shard_params,
    shard_batch,
)
