from dlrm_yx_tpu.data.batch import Batch
from dlrm_yx_tpu.data.synthetic import RandomDataConfig, make_random_batches
