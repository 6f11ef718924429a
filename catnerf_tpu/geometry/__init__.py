from catnerf_tpu.geometry import (  # noqa: F401
    obb,
    pointcloud,
    registration,
    segmentation,
    teaser,
    uncertainty,
)
