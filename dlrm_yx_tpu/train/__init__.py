from dlrm_yx_tpu.train.train_step import make_train_step, make_eval_step
