from dlrm_yx_tpu.models.dlrm import (
    init_dlrm,
    forward,
    forward_logits,
    forward_from_pooled,
    lookup_all_groups,
    assemble_slots,
)
