"""Checkpoint / resume.

The reference saves per-category torch dicts every 2000 iters but never
loads them — resume is vestigial (ref: src/scene_cateogries.py:548-597,
train.py:67 hardcodes start=0, optimizer state never saved). Here resume is
real: the full TrainState (stacked params + optimizer moments + step) is
checkpointed with orbax and restored exactly.

Also provides a converter from the reference's pretrained vMAP `.pth`
OccupancyMap checkpoints (registration stage-2 inputs,
ref: src/category_registration.py:76-92) into our parameter pytrees.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None

from catnerf_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, iteration: int) -> str:
    """Write <ckpt_dir>/<iteration>/ with the full train state."""
    assert ocp is not None, "orbax unavailable"
    path = os.path.join(os.path.abspath(ckpt_dir), f"{iteration}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    return path


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by save_checkpoint; `template` supplies
    the pytree structure/shapes (an initialised state works)."""
    assert ocp is not None, "orbax unavailable"
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path),
                                 jax.device_get(template))
    return restored


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=int))


# ---------------------------------------------------------------------------
# Reference-format conversion
# ---------------------------------------------------------------------------

def _t2np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def load_vmap_pth(path: str) -> dict[str, Any]:
    """Convert a pretrained vMAP per-object `.pth` checkpoint into our
    parameter pytrees (ref format keys: FC_state_dict, PE_state_dict,
    obj_scale, bbox — src/category_registration.py:81-92).

    torch Linear weights are (out, in); ours are (in, out) — transposed here.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    fc_sd = raw["FC_state_dict"]
    pe_sd = raw["PE_state_dict"]

    def lin(prefix: str) -> dict:
        return {
            "w": _t2np(fc_sd[f"{prefix}.weight"]).T,
            "b": _t2np(fc_sd[f"{prefix}.bias"]),
        }

    # OccupancyMap layer graph (ref: src/model.py:86-122): fc_block wraps
    # Sequential(Linear, ReLU) so Linear lives at index 0; mid blocks are
    # Sequential of fc_blocks.
    fc_params = {
        "in_layer": lin("in_layer.0"),
        "mid1": [lin("mid1.0.0")],
        "cat_layer": lin("cat_layer.0"),
        "mid2": [lin("mid2.0.0")],
        "out_alpha": lin("out_alpha"),
    }
    if "out_color.weight" in fc_sd:
        fc_params["color_linear"] = lin("color_linear.0")
        fc_params["out_color"] = lin("out_color")

    pe_params = {"B": _t2np(pe_sd["B_layer.weight"])}
    out = {
        "fc": fc_params,
        "pe": pe_params,
        "obj_scale": float(np.asarray(pe_sd.get("scale", raw.get("obj_scale", 1.0)))),
    }
    if "bbox" in raw:
        out["bbox"] = np.asarray(raw["bbox"])
    return out
