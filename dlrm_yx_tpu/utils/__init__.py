from dlrm_yx_tpu.utils.logging import EventLogger, rank0_print
from dlrm_yx_tpu.utils.profiling import phase_scope, StepTimer
