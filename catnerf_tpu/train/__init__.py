from catnerf_tpu.train import state, step  # noqa: F401
