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


def save_session_checkpoint(ckpt_dir: str, session, iteration: int) -> str:
    """save_checkpoint + an `<iteration>.adopted.json` sidecar recording
    instances written post-training by fit.adopt_instance, in adoption
    order. Without the sidecar a restart loses adoptees entirely: the
    fresh session's code tables have neither their (possibly grown) shape
    nor their sim(3)/extent metadata."""
    import json

    path = save_checkpoint(ckpt_dir, session.state, iteration)
    adopted = getattr(session, "adopted_instances", [])
    sidecar = f"{path}.adopted.json"
    if adopted:
        with open(sidecar, "w") as f:
            json.dump(adopted, f)
    elif os.path.exists(sidecar):
        # a stale sidecar from an earlier same-iteration save (e.g. the
        # ckpt dir was rolled back by hand) would re-grow the restored
        # session's code tables past the saved state's shapes
        os.remove(sidecar)
    return path


def restore_session_checkpoint(path: str, session) -> None:
    """Restore a session from a checkpoint saved by save_session_checkpoint
    (or plain save_checkpoint): re-applies any persisted adoption records
    to the freshly built session FIRST — growing its code tables and
    registering pose/extent metadata so the template's shapes match the
    saved state — then loads the train state in place."""
    import json

    sidecar = f"{path}.adopted.json"
    if os.path.exists(sidecar):
        from catnerf_tpu.fit import apply_adopted_record

        with open(sidecar) as f:
            for rec in json.load(f):
                apply_adopted_record(session, rec)
    session.state = load_checkpoint(path, session.state)


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

    # OccupancyMap layer graph (ref: src/model.py:86-122): delegate to the
    # shared converter, which infers the mid1/mid2 block COUNTS from the
    # keys — a checkpoint trained with hidden_layers_block != 1 must not be
    # silently truncated to one block per side.
    fc_params = occupancy_params_from_state_dict(fc_sd)

    pe_params = {"B": _t2np(pe_sd["B_layer.weight"])}
    out = {
        "fc": fc_params,
        "pe": pe_params,
        "obj_scale": float(np.asarray(pe_sd.get("scale", raw.get("obj_scale", 1.0)))),
    }
    if "bbox" in raw:
        out["bbox"] = np.asarray(raw["bbox"])
    return out


# ---------------------------------------------------------------------------
# Reference-format export: per-category .pth checkpoints with the exact key
# schema the reference writes (ref: src/scene_cateogries.py:548-571), so
# reference-side tooling can consume models trained here. Linear weights are
# transposed back to torch's (out, in).
# ---------------------------------------------------------------------------


def _torch_lin(t, p: dict) -> dict:
    return {"weight": t.tensor(np.asarray(p["w"]).T.copy()),
            "bias": t.tensor(np.asarray(p["b"]).copy())}


def _codenerf_state_dict(t, fc: dict) -> dict:
    """Our CodeNeRF pytree -> reference state_dict names
    (ref: src/model.py:36-54; Sequential wraps put Linear at index 0;
    encoding_shape is a bare Linear; rgb is Sequential(Linear,ReLU,Linear))."""
    sd = {}

    def put(prefix, p):
        for k, v in _torch_lin(t, p).items():
            sd[f"{prefix}.{k}"] = v

    put("encoding_xyz.0", fc["encoding_xyz"])
    # Reference block attrs are 1-indexed SINGULAR names set via setattr
    # (src/model.py:37-41,49-53): shape_latent_layer_1.0.weight etc. —
    # verified against the executable reference model's state_dict().
    for j, p in enumerate(fc["shape_latent_layers"]):
        put(f"shape_latent_layer_{j + 1}.0", p)
    for j, p in enumerate(fc["shape_layers"]):
        put(f"shape_layer_{j + 1}.0", p)
    put("cat_layer.0", fc["cat_layer"])
    put("cat_latent_layer.0", fc["cat_latent_layer"])
    put("encoding_shape", fc["encoding_shape"])
    put("sigma.0", fc["sigma"])
    put("encoding_viewdir.0", fc["encoding_viewdir"])
    for j, p in enumerate(fc["texture_latent_layers"]):
        put(f"texture_latent_layer_{j + 1}.0", p)
    for j, p in enumerate(fc["texture_layers"]):
        put(f"texture_layer_{j + 1}.0", p)
    put("rgb.0", fc["rgb_0"])
    put("rgb.2", fc["rgb_1"])
    return sd


def _occupancy_state_dict(t, fc: dict) -> dict:
    """(ref: src/model.py:96-122; inverse of load_vmap_pth's mapping)."""
    sd = {}

    def put(prefix, p):
        for k, v in _torch_lin(t, p).items():
            sd[f"{prefix}.{k}"] = v

    put("in_layer.0", fc["in_layer"])
    for j, p in enumerate(fc["mid1"]):
        put(f"mid1.{j}.0", p)
    put("cat_layer.0", fc["cat_layer"])
    for j, p in enumerate(fc["mid2"]):
        put(f"mid2.{j}.0", p)
    put("out_alpha", fc["out_alpha"])
    if "color_linear" in fc:
        put("color_linear.0", fc["color_linear"])
        put("out_color", fc["out_color"])
    return sd


def export_reference_checkpoints(session, path: str, iteration: int) -> list[str]:
    """Write per-category reference-schema checkpoints
    `<path>/cls_<id>_iteration_<it>.pth` (+ cls_0 for the background).

    Schema parity (ref: src/scene_cateogries.py:548-571): for object
    categories `bound` holds the trainer's extent_dict ({obj_id: extent}),
    exactly as the reference writes it; the background's `bound` (an Open3D
    OBB object in the reference) is stored as a plain {center, R, extent}
    dict loadable without Open3D. The full OBBs are additionally exported
    under our extension key `obb_dict`.
    """
    import torch as t

    os.makedirs(path, exist_ok=True)
    written = []

    def bound_dict(b):
        return (None if b is None else
                {"center": np.asarray(b.center), "R": np.asarray(b.R),
                 "extent": np.asarray(b.extent)})

    for cls_id in session.cls_ids:
        cat = session.categories[session.cls_ids.index(cls_id)]
        p = session.category_params(cls_id)
        save = {
            "global_step": iteration,
            "PE_state_dict": {"B_layer.weight": t.tensor(
                np.asarray(p["pe"]["B"]).copy())},
            "FC_state_dict": _codenerf_state_dict(t, p["fc"]),
            "cls_id": cls_id,
            "instance_id_to_index": dict(cat.inst_id_to_index),
            "obj_scale": float(session.cfg.obj_scale),
            "obj_tensor_dict": {k: t.tensor(np.asarray(v))
                                for k, v in cat.object_tensor_dict.items()},
            "shape_code_state_dict": {"weight": t.tensor(
                np.asarray(p["shape_codes"]).copy())},
            "texture_code_state_dict": {"weight": t.tensor(
                np.asarray(p["texture_codes"]).copy())},
            # ref stores bound = trainer.extent_dict for object categories
            "bound": {k: np.asarray(v) for k, v in cat.extent_dict.items()},
            "obb_dict": {k: bound_dict(v) for k, v in cat.bound_dict.items()},
        }
        if cat.n_obj > 1:
            save["extent_dict"] = {k: np.asarray(v)
                                   for k, v in cat.extent_dict.items()}
        f = os.path.join(path, f"cls_{cls_id}_iteration_{iteration:05d}.pth")
        t.save(save, f)
        written.append(f)

    if session.background is not None:
        bp = session.background_params()
        save = {
            "global_step": iteration,
            "PE_state_dict": {"B_layer.weight": t.tensor(
                np.asarray(bp["pe"]["B"]).copy())},
            "FC_state_dict": _occupancy_state_dict(t, bp["fc"]),
            "cls_id": 0,
            "instance_id_to_index": {0: 0},
            "obj_scale": float(session.cfg.bg_scale),
            "bound": bound_dict(session.background.bound),
        }
        f = os.path.join(path, f"cls_0_iteration_{iteration:05d}.pth")
        t.save(save, f)
        written.append(f)
    return written


# ---------------------------------------------------------------------------
# Reference-format import: the inverse of export_reference_checkpoints.
# Loads reference-trained per-category `.pth` checkpoints (schema:
# src/scene_cateogries.py:548-597) into a TrainingSession's stacked params,
# so reference-trained weights can be meshed + evaluated through this stack
# (the strongest dataset-free end-to-end parity check; VERDICT r1 item #3).
# ---------------------------------------------------------------------------


def _np(v) -> np.ndarray:
    """Tolerant tensor/array/list -> numpy (torch tensors included)."""
    if hasattr(v, "detach"):
        return np.asarray(v.detach().cpu().numpy())
    return np.asarray(v)


def codenerf_params_from_state_dict(fc_sd: dict) -> dict:
    """Reference CodeNeRF state_dict -> our parameter pytree (inverse of
    _codenerf_state_dict; layer names per src/model.py:30-54). Block counts
    are inferred from the keys, torch (out, in) weights transposed."""

    def lin(prefix: str) -> dict:
        return {"w": _np(fc_sd[f"{prefix}.weight"]).T.copy(),
                "b": _np(fc_sd[f"{prefix}.bias"]).copy()}

    def blocks(name: str) -> list:
        # Reference naming (src/model.py:37-41,49-53): 1-indexed singular
        # `<name>_<j+1>.0.*`. Older exports from this repo used a plural
        # 0-indexed `<name>s.<j>.0.*` — accepted as a fallback.
        out = []
        j = 0
        while f"{name}_{j + 1}.0.weight" in fc_sd:
            out.append(lin(f"{name}_{j + 1}.0"))
            j += 1
        if not out:
            while f"{name}s.{j}.0.weight" in fc_sd:
                out.append(lin(f"{name}s.{j}.0"))
                j += 1
        return out

    return {
        "encoding_xyz": lin("encoding_xyz.0"),
        "cat_layer": lin("cat_layer.0"),
        "cat_latent_layer": lin("cat_latent_layer.0"),
        "encoding_shape": lin("encoding_shape"),
        "sigma": lin("sigma.0"),
        "encoding_viewdir": lin("encoding_viewdir.0"),
        "rgb_0": lin("rgb.0"),
        "rgb_1": lin("rgb.2"),
        "shape_latent_layers": blocks("shape_latent_layer"),
        "shape_layers": blocks("shape_layer"),
        "texture_latent_layers": blocks("texture_latent_layer"),
        "texture_layers": blocks("texture_layer"),
    }


def occupancy_params_from_state_dict(fc_sd: dict) -> dict:
    """Reference OccupancyMap state_dict -> our pytree (inverse of
    _occupancy_state_dict; src/model.py:86-122)."""

    def lin(prefix: str) -> dict:
        return {"w": _np(fc_sd[f"{prefix}.weight"]).T.copy(),
                "b": _np(fc_sd[f"{prefix}.bias"]).copy()}

    def blocks(name: str) -> list:
        out = []
        j = 0
        while f"{name}.{j}.0.weight" in fc_sd:
            out.append(lin(f"{name}.{j}.0"))
            j += 1
        return out

    params = {
        "in_layer": lin("in_layer.0"),
        "mid1": blocks("mid1"),
        "cat_layer": lin("cat_layer.0"),
        "mid2": blocks("mid2"),
        "out_alpha": lin("out_alpha"),
    }
    if "out_color.weight" in fc_sd:
        params["color_linear"] = lin("color_linear.0")
        params["out_color"] = lin("out_color")
    return params


def find_reference_checkpoints(path: str, iteration: int | None = None
                               ) -> dict[int, str]:
    """Map cls_id -> checkpoint file under `path`, picking the latest
    iteration (or the given one) per category. Filename convention:
    cls_<id>_iteration_<it>.pth (ref: src/scene_cateogries.py:549)."""
    import re

    found: dict[int, tuple[int, str]] = {}
    for fn in os.listdir(path):
        m = re.match(r"cls_(\d+)_iteration_(\d+)\.pth$", fn)
        if not m:
            continue
        cls_id, it = int(m.group(1)), int(m.group(2))
        if iteration is not None and it != iteration:
            continue
        if cls_id not in found or it > found[cls_id][0]:
            found[cls_id] = (it, os.path.join(path, fn))
    return {cls_id: fp for cls_id, (_, fp) in found.items()}


def import_reference_checkpoints(session, path: str,
                                 iteration: int | None = None) -> int:
    """Load reference-schema per-category checkpoints into `session`'s
    stacked params (PE basis, CodeNeRF/OccupancyMap weights, latent codes)
    and per-category metadata (object tensors, extents, bounds). Mutates
    session.state in place; optimizer moments are left untouched. Returns
    the checkpoints' global_step."""
    import torch

    from catnerf_tpu.data.scene import OrientedBBox
    from catnerf_tpu.train.state import TrainState

    files = find_reference_checkpoints(path, iteration)
    if not files:
        raise FileNotFoundError(f"no cls_*_iteration_*.pth under {path}")

    params = jax.tree_util.tree_map(
        lambda x: np.array(jax.device_get(x)), session.state.params)
    global_step = 0

    def set_idx(stacked_tree, i, new_tree):
        return jax.tree_util.tree_map(
            lambda s, n: _assign_row(s, i, n), stacked_tree, new_tree)

    def _assign_row(stacked, i, new):
        new = np.asarray(new, stacked.dtype)
        assert stacked.shape[1:] == new.shape, (
            f"shape mismatch: stacked {stacked.shape} vs ckpt {new.shape}")
        stacked[i] = new
        return stacked

    for i, cls_id in enumerate(session.cls_ids):
        if cls_id not in files:
            print(f"no reference checkpoint for cls {cls_id}; keeping "
                  f"current params")
            continue
        raw = torch.load(files[cls_id], map_location="cpu",
                         weights_only=False)
        global_step = max(global_step, int(raw.get("global_step", 0)))
        cat = session.categories[i]

        params["cat_pe"] = set_idx(
            params["cat_pe"], i, {"B": _np(raw["PE_state_dict"]["B_layer.weight"])})
        params["cat_fc"] = set_idx(
            params["cat_fc"], i,
            codenerf_params_from_state_dict(raw["FC_state_dict"]))

        # Latent codes: remap checkpoint rows -> session slots by obj_id.
        ck_map = {int(k): int(v)
                  for k, v in raw["instance_id_to_index"].items()}
        sc = _np(raw["shape_code_state_dict"]["weight"])
        tc = _np(raw["texture_code_state_dict"]["weight"])
        for obj_id, slot in cat.inst_id_to_index.items():
            if obj_id not in ck_map:
                print(f"cls {cls_id}: obj {obj_id} missing from checkpoint")
                continue
            params["codes"]["shape"][i, slot] = sc[ck_map[obj_id]]
            params["codes"]["texture"][i, slot] = tc[ck_map[obj_id]]

        # Per-category metadata used by meshing/eval.
        if "obj_tensor_dict" in raw:
            cat.object_tensor_dict = {
                int(k): _np(v) for k, v in raw["obj_tensor_dict"].items()}
        if "extent_dict" in raw:
            cat.extent_dict = {int(k): _np(v)
                               for k, v in raw["extent_dict"].items()}
        elif isinstance(raw.get("bound"), dict) and raw["bound"] and \
                not any(isinstance(v, dict) for v in raw["bound"].values()):
            # single-instance categories: ref stores bound = extent_dict
            cat.extent_dict = {int(k): _np(v)
                               for k, v in raw["bound"].items()}
        if "obb_dict" in raw:  # our extension: full OBBs
            cat.bound_dict = {
                int(k): (None if v is None else OrientedBBox(
                    center=_np(v["center"]), R=_np(v["R"]),
                    extent=_np(v["extent"])))
                for k, v in raw["obb_dict"].items()}

    if session.background is not None and 0 in files:
        raw = torch.load(files[0], map_location="cpu", weights_only=False)
        global_step = max(global_step, int(raw.get("global_step", 0)))
        params["bg_pe"] = jax.tree_util.tree_map(
            lambda s, n: np.asarray(n, s.dtype), params["bg_pe"],
            {"B": _np(raw["PE_state_dict"]["B_layer.weight"])})
        params["bg_fc"] = jax.tree_util.tree_map(
            lambda s, n: np.asarray(n, s.dtype), params["bg_fc"],
            occupancy_params_from_state_dict(raw["FC_state_dict"]))
        b = raw.get("bound")
        if isinstance(b, dict) and "center" in b:
            session.background.bound = OrientedBBox(
                center=_np(b["center"]), R=_np(b["R"]),
                extent=_np(b["extent"]))

    session.state = TrainState(
        params=jax.tree_util.tree_map(jnp_asarray, params),
        opt_state=session.state.opt_state,
        step=session.state.step,
    )
    return global_step


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
