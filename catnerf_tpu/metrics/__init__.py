from catnerf_tpu.metrics import metrics3d  # noqa: F401
