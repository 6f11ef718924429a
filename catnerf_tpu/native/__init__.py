from catnerf_tpu.native.lib import geomlib  # noqa: F401
