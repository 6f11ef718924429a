from catnerf_tpu.mesher import mesh, meshing  # noqa: F401
