from catnerf_tpu.geometry import pointcloud, segmentation  # noqa: F401
