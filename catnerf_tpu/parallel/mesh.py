"""Device-mesh construction.

The reference is strictly single-device (SURVEY.md §2.2: no DDP/NCCL/MPI
anywhere). The TPU-native design scales along the two axes the workload
actually has:

  'data'  — the ray batch (data parallel); gradients all-reduce over ICI
  'model' — the category axis (expert-parallel-style: per-category models
            are independent experts with static routing)

Tensor/pipeline parallelism are intentionally absent: the MLPs are 32-128
wide, far below a single MXU tile (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """('data', 'model') mesh. Defaults to all visible devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        if n_total % n_model != 0:
            raise ValueError(
                f"n_model={n_model} does not divide the {n_total} visible "
                f"devices; pick a divisor of {n_total} (e.g. "
                f"{[d for d in range(1, n_total + 1) if n_total % d == 0]})")
        n_data = n_total // n_model
    if n_data * n_model > n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"only {n_total} visible")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(n_data=1, n_model=1)
