from qcnn_gpu_tpu.train.trainer import TrainConfig, Trainer, make_train_step  # noqa: F401
from qcnn_gpu_tpu.train.finetune import quant_finetune  # noqa: F401
