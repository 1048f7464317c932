from qcnn_gpu_tpu.data import model_files, yuv  # noqa: F401
