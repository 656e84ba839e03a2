from dlrm_yx_tpu.ops.mlp import init_mlp, apply_mlp
from dlrm_yx_tpu.ops.interaction import interact_features
from dlrm_yx_tpu.ops.losses import loss_fn
from dlrm_yx_tpu.ops.embedding import (
    TableGroup,
    build_table_groups,
    init_emb_group,
    lookup_group,
    flat_row_grads,
)
from dlrm_yx_tpu.ops.coalesce import coalesce_rows
