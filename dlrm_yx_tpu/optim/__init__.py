from dlrm_yx_tpu.optim.optimizer import (
    OptConfig,
    init_opt_state,
    dense_update,
    sparse_update,
)
from dlrm_yx_tpu.optim.lr_policy import LRPolicy
