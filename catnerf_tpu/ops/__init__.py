from catnerf_tpu.ops import render, sampling, sim3  # noqa: F401
