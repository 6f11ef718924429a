from catnerf_tpu.parallel import mesh, sharding  # noqa: F401
