from catnerf_tpu.data import camera, scene, synthetic, transforms  # noqa: F401
