from qcnn_gpu_tpu.engine.runner import Engine, RunRecord  # noqa: F401
