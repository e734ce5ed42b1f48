from variational_mmt_tpu.train.loss import compute_loss, kl_beta  # noqa: F401
from variational_mmt_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
