from flowtron_tpu.train.loss import flowtron_loss, attention_ctc_loss  # noqa: F401
from flowtron_tpu.train.radam import radam, build_optimizer  # noqa: F401
