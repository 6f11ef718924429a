"""Test-time reconstruction of a new instance from a trained category prior.

The payoff of category-level fields (the paper's motivation, ref:
src/model.py:22-84 + README.md:8): once a category's CodeNeRF MLP is
trained, a NEW, partially observed instance of that category can be
reconstructed WITHOUT retraining — freeze the MLP and positional encoding
and optimize only a fresh pair of shape/texture latent codes (a few hundred
Adam steps over the instance's own rays, initialised at the category-mean
code). The shared MLP supplies the category prior, so unobserved parts of
the new object complete plausibly. The reference has no such entry point
(its ghost `reconstruct` module re-meshes trained checkpoints); this is a
capability beyond it, built from the same step math (ops/sampling.py,
ops/losses.py — ref: src/scene_cateogries.py:453-546, src/loss.py:18-74).

Only meaningful for multi-instance categories: their fields live in the
registered canonical frame, where any instance maps through its sim(3)
`T_obj`. Single-instance categories train in world frame at the original
object's location, so there is no reusable prior to fit against.

CLI:
  python -m catnerf_tpu.fit --logdir <dir> [--synthetic | --config <json>]
      --cls <cls_id> --obj <inst_id> [--steps 600] [--mesh] [--views N]
fits codes for the named instance's observations against the checkpoint's
frozen MLP (the instance may or may not have been in the training set) and
writes metrics, orbit renders, and optionally a mesh.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.models import codenerf, embedding
from catnerf_tpu.ops import losses, sampling


class FitResult(NamedTuple):
    shape_code: np.ndarray
    texture_code: np.ndarray
    final_loss: float          # NOTE: the total is not monotone in fit
                               # quality (the depth term's 1/sqrt(var)
                               # weighting grows as depth sharpens,
                               # ref: src/loss.py:46,54) — compare PSNRs
    final_psnr: float          # L1-PSNR proxy on the fit rays
    init_loss: float           # loss at the init codes (first ray draw)
    init_psnr: float           # L1-PSNR at the init codes
    extent: np.ndarray         # metric extent for meshing/framing
    steps: int
    T_obj: np.ndarray          # the (possibly refined) sim(3) object pose


def build_canonical_rays(frame_info: list, sample_dict: dict,
                         cam: CameraInfo, T_obj: np.ndarray,
                         this_id: int) -> dict:
    """Canonical-object-frame ray arrays for one instance's bbox crops —
    the same recipe the scene buffer uses (data/scene.py::
    build_instance_ray_arrays; ref: src/scene_cateogries.py:24-35,235-238):
    rays go through inv(T_obj) @ T_WC, inheriting the 1/s sim(3) factor,
    while depth stays metric."""
    from catnerf_tpu.data.scene import build_instance_ray_arrays

    T_obj_inv = np.linalg.inv(np.asarray(T_obj, np.float64))

    def pose_fn(T_wc):
        T_oc = T_obj_inv @ T_wc
        return T_oc[:3, :3], T_oc[:3, 3]

    return build_instance_ray_arrays(frame_info, sample_dict, cam, this_id,
                                     pose_fn)


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' rotation from an axis-angle vector (differentiable,
    guarded at w -> 0)."""
    th2 = (w * w).sum()
    th = jnp.sqrt(th2 + 1e-12)
    K = jnp.array([[0.0, -w[2], w[1]],
                   [w[2], 0.0, -w[0]],
                   [-w[1], w[0], 0.0]])
    return (jnp.eye(3) + jnp.sin(th) / th * K
            + (1.0 - jnp.cos(th)) / (th2 + 1e-12) * (K @ K))


class _FitStatics(NamedTuple):
    """Hashable scalar config for the module-level jitted fit superstep.
    Everything data-like (ray arrays, frozen PE/MLP params, valid-row
    count) is a traced ARGUMENT instead of a Python closure: a closure
    would bake the arrays into the lowered module as dense constants, so
    neither the in-process jit cache nor the persistent compilation cache
    could ever hit across fits — every /ingest request would pay a full
    fresh XLA compile (20-45 s, or minutes on an axon stall)."""
    n_rays: int
    n_inner: int
    optimize_pose: bool
    lr: float
    n_bins_cam2surface: int
    n_bins: int
    min_depth: float
    surface_eps: float
    stop_eps: float
    obj_scale: float
    max_deg: int
    color_scaling: float
    opacity_scaling: float


def _fit_loss(fp: dict, k: jax.Array, data: dict, n_valid: jnp.ndarray,
              pe: dict, fc: dict, st: _FitStatics):
    """One ray-batch loss draw against the frozen (pe, fc). data rows at
    index >= n_valid are padding and are never drawn."""
    codes = fp["codes"]
    k_draw, k_sample = jax.random.split(k)
    idx = jax.random.randint(k_draw, (st.n_rays,), 0, n_valid)
    o = jnp.take(data["origins"], idx, axis=0)
    d = jnp.take(data["dirs"], idx, axis=0)
    if st.optimize_pose:
        # effective pose T_obj @ D => rays get inv(D):
        # o' = R^T (o - t) / s, d' = R^T d / s
        pose = fp["pose"]
        Rt = _so3_exp(pose["w"]).T
        inv_s = jnp.exp(-pose["log_s"])
        o = (o - pose["t"]) @ Rt.T * inv_s
        d = d @ Rt.T * inv_s
    rays = sampling.sample_3d_points(
        k_sample, jnp.take(data["rgb"], idx, axis=0),
        jnp.take(data["state"], idx), jnp.take(data["depth"], idx), o, d,
        n_bins_cam2surface=st.n_bins_cam2surface, n_bins=st.n_bins,
        min_depth=st.min_depth, surface_eps=st.surface_eps,
        stop_eps=st.stop_eps)
    emb = embedding.apply(pe, rays.input_pcs, scale=st.obj_scale,
                          max_deg=st.max_deg)
    sigma, color = codenerf.apply(fc, emb, codes["shape"], codes["texture"])
    lb = losses.step_batch_loss(
        sigma[None, ..., 0], color[None], rays.gt_depth[None],
        rays.gt_rgb[None], rays.obj_labels[None],
        rays.valid_depth_mask[None], rays.z_vals[None],
        color_scaling=st.color_scaling,
        opacity_scaling=st.opacity_scaling)
    return lb.total, losses.psnr_from_l1(lb.psnr_color[0])


@partial(jax.jit, static_argnames=("st",))
def _fit_superstep(carry, k: jax.Array, data: dict, n_valid: jnp.ndarray,
                   pe: dict, fc: dict, st: _FitStatics):
    """st.n_inner Adam steps in one dispatch (lax.scan). Module-level so
    repeat fits reuse the in-process jit cache, and keyed only on shapes +
    statics so the persistent compilation cache hits across runs."""
    tx = optax.adam(st.lr)

    def one_step(c, kk):
        fp, opt_state = c
        (loss, psnr), grads = jax.value_and_grad(
            _fit_loss, has_aux=True)(fp, kk, data, n_valid, pe, fc, st)
        updates, opt_state = tx.update(grads, opt_state, fp)
        fp = optax.apply_updates(fp, updates)
        return (fp, opt_state), (loss, psnr)

    keys = jax.random.split(k, st.n_inner)
    return jax.lax.scan(one_step, carry, keys)


def fit_instance(session, cls_id: int, frame_info: list, sample_dict: dict,
                 cam: CameraInfo, T_obj: np.ndarray, inst_id: int, *,
                 extent=None, steps: int = 600, n_rays: int = 360,
                 lr: float = 5e-3, init: str = "mean",
                 key: jax.Array | None = None, n_inner: int = 100,
                 max_rays: int = 200_000,
                 optimize_pose: bool = False) -> FitResult:
    """Optimize shape/texture codes for a new instance against the frozen
    category MLP. init: 'mean' (category-mean code — the prior) or 'zero'.

    extent: metric OBB extent for the returned framing/meshing hint;
    derived from the observed depths if omitted.

    optimize_pose: jointly optimize a sim(3) correction D (log-scale +
    axis-angle + translation, init identity) applied in the canonical
    frame — the effective pose becomes T_obj @ D, and the returned
    FitResult.T_obj carries it. Makes the fit robust to registration
    error in the initial T_obj."""
    from catnerf_tpu.edit import mean_codes

    cfg = session.cfg
    cat = session.categories[session.cls_ids.index(cls_id)]
    if cat.n_obj <= 1:
        raise ValueError(
            f"category {cls_id} trained single-instance (world frame); "
            "there is no canonical-frame prior to fit a new instance into")
    params = session.category_params(cls_id)
    pe, fc = params["pe"], params["fc"]

    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    arrays = build_canonical_rays(frame_info, sample_dict, cam, T_obj,
                                  inst_id)
    n = arrays["depth"].shape[0]
    rng = np.random.default_rng(cfg.seed)
    if n > max_rays:
        sel = rng.choice(n, max_rays, replace=False)
        arrays = {k: v[sel] for k, v in arrays.items()}
        n = max_rays
    if n == 0:
        raise ValueError(f"instance {inst_id}: no rays in frame_info crops")

    if init not in ("mean", "zero"):
        raise ValueError(f"init must be mean|zero, got {init!r}")
    sc0, tc0 = mean_codes(session, cls_id, zero=(init == "zero"))
    fit_params = {"codes": {"shape": jnp.asarray(sc0),
                            "texture": jnp.asarray(tc0)}}
    if optimize_pose:
        fit_params["pose"] = {"log_s": jnp.zeros(()),
                              "w": jnp.zeros(3), "t": jnp.zeros(3)}

    # pad the ray rows to the next power of two (floor 1024): the superstep
    # program then depends only on the BUCKET size, so instances with
    # different ray counts in the same bucket share one compile (in-process
    # and in the persistent cache); rows >= n are never drawn
    n_pad = max(1024, 1 << (n - 1).bit_length())

    def _pad(v):
        if n_pad == n:
            return v
        return np.concatenate(
            [v, np.zeros((n_pad - n, *v.shape[1:]), v.dtype)])

    data = {
        "origins": jnp.asarray(_pad(arrays["origins"])),
        "dirs": jnp.asarray(_pad(arrays["dirs"])),
        "rgb": jnp.asarray(_pad(arrays["rgb"]), jnp.float32) / 255.0,
        "state": jnp.asarray(_pad(arrays["state"]), jnp.int32),
        "depth": jnp.asarray(_pad(arrays["depth"])),
    }
    n_valid = jnp.asarray(n, jnp.int32)

    def statics(inner: int) -> _FitStatics:
        return _FitStatics(
            n_rays=n_rays, n_inner=inner, optimize_pose=optimize_pose,
            lr=lr, n_bins_cam2surface=cfg.n_bins_cam2surface,
            n_bins=cfg.n_bins, min_depth=cfg.min_depth,
            surface_eps=cfg.surface_eps, stop_eps=cfg.stop_eps,
            obj_scale=cfg.obj_scale, max_deg=cfg.n_unidir_funcs,
            color_scaling=cfg.color_scaling,
            opacity_scaling=cfg.opacity_scaling)

    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    opt_state = optax.adam(lr).init(fit_params)

    init_loss, init_psnr = (float(x) for x in _fit_loss(
        fit_params, jax.random.fold_in(key, 0), data, n_valid, pe, fc,
        statics(n_inner)))
    carry = (fit_params, opt_state)
    # run exactly `steps` optimizer steps: full n_inner-sized dispatches
    # plus one remainder-sized dispatch (each size compiles once, cached)
    inner = min(n_inner, steps)
    chunks = [inner] * (steps // inner)
    if steps % inner:
        chunks.append(steps % inner)
    for sz in chunks:
        key, k = jax.random.split(key)
        carry, (loss_hist, psnr_hist) = _fit_superstep(
            carry, k, data, n_valid, pe, fc, statics(sz))
    fit_params = carry[0]
    codes = fit_params["codes"]

    T_eff = np.asarray(T_obj, np.float64).copy()
    if optimize_pose:
        pose = fit_params["pose"]
        D = np.eye(4)
        D[:3, :3] = (np.exp(float(pose["log_s"]))
                     * np.asarray(_so3_exp(pose["w"])))
        D[:3, 3] = np.asarray(pose["t"])
        T_eff = T_eff @ D

    if extent is None:
        # observed canonical surface extent, metric-scaled back by s(T_eff)
        s = abs(np.linalg.det(T_eff[:3, :3])) ** (1 / 3)
        d = arrays["depth"]
        ok = (arrays["state"] == 1) & (d > 0)
        if ok.any():
            pts_c = (arrays["origins"][ok]
                     + arrays["dirs"][ok] * d[ok, None])
            if optimize_pose:
                # map into the refined canonical frame: x' = inv(D) x
                sD = abs(np.linalg.det(D[:3, :3])) ** (1 / 3)
                RD = D[:3, :3] / sD
                pts_c = (pts_c - D[:3, 3]) @ RD / sD
            extent = (pts_c.max(0) - pts_c.min(0)) * s
        else:
            extent = np.full(3, 2.0 * s)

    return FitResult(
        shape_code=np.asarray(codes["shape"]),
        texture_code=np.asarray(codes["texture"]),
        final_loss=float(loss_hist[-1]), final_psnr=float(psnr_hist[-1]),
        init_loss=init_loss, init_psnr=init_psnr,
        extent=np.asarray(extent, np.float64),
        steps=steps, T_obj=T_eff)


def adopt_instance(session, cls_id: int, inst_id: int,
                   result: FitResult) -> None:
    """Write a fitted instance into the live session, so it meshes,
    renders, and serves exactly like a trained one (the new-scan workflow:
    observe -> register -> fit codes -> adopt -> serve, no retraining).

    Grows the padded [n_cls, max_obj, D] code tables — and the matching
    AdamW moments inside the optimizer state, zeros at the new slot — when
    the category is full, inserts the fitted codes, and registers the
    instance's sim(3) pose/extent metadata. The compiled train step is
    invalidated (the code-table shape and validity mask changed); note the
    ray store is NOT rebuilt, so further training keeps sampling only the
    original instances, and mesh-time space carving only knows the
    original views (add the new observations to session.sample_dict if
    they should carve).

    The adoption is recorded in session.adopted_instances;
    train/checkpoint.py::save_session_checkpoint persists the records as a
    sidecar so adopted instances survive a restart.
    """
    from catnerf_tpu.ops.sim3 import sim3_to_tensor_np

    obj_tensor = sim3_to_tensor_np(np.asarray(result.T_obj, np.float64))
    rec = {"cls": int(cls_id), "id": int(inst_id),
           "extent": np.asarray(result.extent, np.float64).tolist(),
           "obj_tensor": np.asarray(obj_tensor, np.float64).tolist()}
    _adopt_slot(session, rec, result.shape_code, result.texture_code)


def apply_adopted_record(session, rec: dict) -> None:
    """Re-apply one persisted adoption record to a freshly built session:
    grows the code tables/optimizer moments and registers the metadata,
    with ZERO codes at the new slot — the real codes live in the
    checkpointed params, which restore_session_checkpoint loads right
    after (the grown template then matches the saved shapes)."""
    D = session.cfg.net_hyperparams.latent_dim
    zero = np.zeros(D, np.float32)
    _adopt_slot(session, rec, zero, zero)


def _adopt_slot(session, rec: dict, shape_code, texture_code) -> None:
    from catnerf_tpu.models import codes as codes_mod
    from catnerf_tpu.train.state import TrainState
    from catnerf_tpu.train.step import make_train_step

    cls_id, inst_id = rec["cls"], rec["id"]
    cat = session.categories[session.cls_ids.index(cls_id)]
    if cat.n_obj <= 1:
        raise ValueError(f"category {cls_id} is single-instance "
                         "(world-frame field); nothing to adopt into")
    if inst_id in cat.inst_id_to_index:
        raise ValueError(f"instance {inst_id} already exists in "
                         f"category {cls_id}")
    if inst_id <= 0:
        raise ValueError(f"instance id must be > 0 (0 = background), "
                         f"got {inst_id}")

    ci = session.cls_ids.index(cls_id)
    slot = cat.n_obj
    params = dict(session.state.params)
    codes = dict(params["codes"])
    n_cls, max_obj, D = codes["shape"].shape
    opt_state = session.state.opt_state

    if slot >= max_obj:
        def grow(x):
            return jnp.pad(x, ((0, 0), (0, 1), (0, 0)))

        codes = {k: grow(v) for k, v in codes.items()}

        def grow_moment(path, leaf):
            # AdamW mu/nu mirror the param tree: the code moments are the
            # only 3-D [n_cls, max_obj, D] arrays under a 'codes' key
            in_codes = any(getattr(p, "key", None) == "codes" for p in path)
            if (in_codes and getattr(leaf, "ndim", 0) == 3
                    and leaf.shape == (n_cls, max_obj, D)):
                return grow(leaf)  # zero moments at the new slot
            return leaf

        opt_state = jax.tree_util.tree_map_with_path(grow_moment, opt_state)
        max_obj += 1

    codes["shape"] = codes["shape"].at[ci, slot].set(
        jnp.asarray(shape_code))
    codes["texture"] = codes["texture"].at[ci, slot].set(
        jnp.asarray(texture_code))
    params["codes"] = codes
    session.state = TrainState(params=params, opt_state=opt_state,
                               step=session.state.step)

    cat.obj_ids.append(inst_id)
    cat.inst_id_to_index[inst_id] = slot
    cat.n_obj += 1
    cat.extent_dict[inst_id] = np.asarray(rec["extent"], np.float64)
    cat.object_tensor_dict[inst_id] = np.asarray(rec["obj_tensor"],
                                                 np.float64)
    session.adopted_instances.append(dict(rec))

    session.obj_mask = codes_mod.obj_validity_mask(
        [c.n_obj for c in session.categories], max_n_obj=max_obj)
    session.install_step(make_train_step(
        session.cfg, session.obj_mask,
        with_background=session.background is not None, jit=False))
    if session._superstep is not None:
        # shapes changed: rebuild the fast path now (run_fast asserts
        # rather than rebuilding). The ray store keeps only the ORIGINAL
        # instances' rays — further training never samples the adoptee.
        session.enable_fast_path(session._n_inner,
                                 device_mesh=session._device_mesh)


def build_observation_frames(rgb: np.ndarray, depth: np.ndarray,
                             mask: np.ndarray, T_wc: np.ndarray,
                             cam: CameraInfo, inst_id: int, *,
                             bbox_scale: float = 0.2):
    """Private (frames, frame_info) for raw posed RGB-D observations of ONE
    new instance — the serving-side mirror of the dataset loaders' per-frame
    bbox recipe (data/replica.py:121-140; ref: src/dataset.py:135-156).

    Arrays use the repo's transposed (W, H) layout:
      rgb   [n, W, H, 3] uint8
      depth [n, W, H] float32, meters (invalid pixels 0)
      mask  [n, W, H] int8/bool — >0 this instance, 0 other/background,
            <0 unknown (excluded from opacity supervision)
      T_wc  [n, 4, 4] camera->world poses

    Frames whose mask is empty or tinier than the loaders' 10-px floor are
    skipped. Returns ({frame_idx: sample}, frame_info) shaped exactly like
    the dataset's sample_dict/inst_dict contract, so the result feeds
    accumulate_pointcloud and fit_instance unchanged."""
    from catnerf_tpu.data.bbox import enlarge_bbox, mask_bbox

    rgb = np.asarray(rgb)
    depth = np.asarray(depth, np.float32)
    mask = np.asarray(mask)
    T_wc = np.asarray(T_wc, np.float64)
    n = rgb.shape[0]
    want = (cam.width, cam.height)
    if (rgb.shape != (n, *want, 3) or depth.shape != (n, *want)
            or mask.shape != (n, *want) or T_wc.shape != (n, 4, 4)):
        raise ValueError(
            f"observation shapes must be rgb [n,{want[0]},{want[1]},3], "
            f"depth/mask [n,{want[0]},{want[1]}], T_wc [n,4,4] "
            f"(transposed W,H layout); got rgb {rgb.shape}, depth "
            f"{depth.shape}, mask {mask.shape}, T_wc {T_wc.shape}")
    mask = mask.astype(np.int8) if mask.dtype == bool else mask

    frames: dict[int, dict] = {}
    frame_info: list[dict] = []
    for i in range(n):
        m = mask[i] > 0
        bb = mask_bbox(m)
        if bb is None:
            continue
        rmin, rmax, cmin, cmax = bb
        if rmax - rmin <= 10 or cmax - cmin <= 10:
            continue  # loaders' small-crop floor (ref: src/dataset.py:139-143)
        enlarged = enlarge_bbox([cmin, rmin, cmax, rmax], bbox_scale,
                                w=m.shape[1], h=m.shape[0])
        if enlarged is None:
            continue
        # -2 is never an instance id: those pixels become pixel-state 0
        # ("other"); <0 in the caller's mask stays -1 -> state 2 (unknown)
        obj_mask = np.where(m, inst_id,
                            np.where(mask[i] < 0, -1, -2)).astype(np.int32)
        frames[i] = {"image": rgb[i].astype(np.uint8), "depth": depth[i],
                     "obj_mask": obj_mask, "T": T_wc[i], "frame_id": i}
        frame_info.append({"frame": i,
                           "bbox": np.array([enlarged[1], enlarged[3],
                                             enlarged[0], enlarged[2]])})
    if not frame_info:
        raise ValueError("no usable observation frames (empty or sub-10-px "
                         "instance masks in every frame)")
    return frames, frame_info


def ingest_new_instance(session, cls_id: int, rgb, depth, mask, T_wc, *,
                        inst_id: int | None = None, steps: int = 600,
                        n_rays: int = 360, lr: float = 5e-3,
                        accumulate: str = "direct",
                        adopt: bool = True) -> dict:
    """The full new-scan workflow from raw arrays: posed RGB-D observations
    of an unseen instance -> world point cloud -> sim(3) registration
    against the trained category's canonical union
    (geometry/registration.py::register_new_instance) -> code-only fit with
    joint pose refinement against the frozen category MLP -> adoption into
    the live session (meshes, renders, serves like a trained instance).

    Array layout contract: build_observation_frames. accumulate: 'direct'
    (clean depth, ref: src/utils.py:189-210) or 'tsdf' (noisy real-world
    depth, ref: src/utils.py:212-247). Returns a JSON-ready summary dict.
    """
    from catnerf_tpu.geometry.pointcloud import (accumulate_pointcloud,
                                                 accumulate_pointcloud_tsdf)
    from catnerf_tpu.geometry.registration import register_new_instance
    from catnerf_tpu.ops.sim3 import tensor_to_sim3_np

    if cls_id not in session.cls_ids:
        raise ValueError(f"unknown category {cls_id} "
                         f"(have {session.cls_ids})")
    cat = session.categories[session.cls_ids.index(cls_id)]
    if cat.n_obj <= 1:
        raise ValueError(f"category {cls_id} is single-instance (world "
                         "frame); there is no canonical prior to ingest "
                         "into")
    all_ids = {int(o) for c in session.categories for o in c.obj_ids}
    if inst_id is None:
        inst_id = max(all_ids, default=0) + 1  # flat serving namespace
    elif int(inst_id) in all_ids:
        raise ValueError(f"instance id {inst_id} already exists")
    elif int(inst_id) <= 0:
        # 0 is the background sentinel (/mesh?id=0 would shadow it) and
        # negative ids collide with the pixel-state sentinels (-1 unknown,
        # -2 other) in build_observation_frames
        raise ValueError(f"instance id must be > 0, got {inst_id}")
    inst_id = int(inst_id)

    frames, frame_info = build_observation_frames(rgb, depth, mask, T_wc,
                                                  session.cam, inst_id)
    if accumulate not in ("direct", "tsdf"):
        raise ValueError(f"accumulate must be direct|tsdf, got {accumulate!r}")
    acc = (accumulate_pointcloud if accumulate == "direct"
           else accumulate_pointcloud_tsdf)
    pcs_new = acc(inst_id, frame_info, frames, session.cam)
    if len(pcs_new) < 3:
        raise ValueError("observations unproject to fewer than 3 points")

    registered = []
    for oid in cat.obj_ids:
        fi = cat.frame_info_dict.get(oid)
        tensor = cat.object_tensor_dict.get(oid)
        if fi is None or tensor is None:
            continue  # e.g. a previously adopted instance — no frames here
        registered.append((accumulate_pointcloud(oid, fi,
                                                 session.sample_dict,
                                                 session.cam),
                           tensor_to_sim3_np(tensor)))
    if not registered:
        raise ValueError(f"category {cls_id} has no trained instances with "
                         "stored observations to register against")
    T_est, reg_cd = register_new_instance(registered, pcs_new)

    res = fit_instance(session, cls_id, frame_info, frames, session.cam,
                       T_est, inst_id, steps=steps, n_rays=n_rays, lr=lr,
                       optimize_pose=True)
    if adopt:
        adopt_instance(session, cls_id, inst_id, res)
    return {
        "id": inst_id,
        "cls": cls_id,
        "frames_used": len(frame_info),
        "registration_chamfer": round(float(reg_cd), 4),
        "fit_steps": res.steps,
        "psnr_prior_init": round(res.init_psnr, 2),
        "psnr_after_fit": round(res.final_psnr, 2),
        "extent": [round(float(v), 4) for v in res.extent],
        "T_obj": np.asarray(res.T_obj).tolist(),
        "adopted": bool(adopt),
    }


def main() -> None:
    import argparse

    from catnerf_tpu.utils import enable_compilation_cache

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--cls", type=int, required=True)
    parser.add_argument("--obj", type=int, required=True,
                        help="instance id to fit (its observations come "
                             "from the dataset; its codes are fit fresh)")
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--n-rays", type=int, default=360)
    parser.add_argument("--lr", type=float, default=5e-3)
    parser.add_argument("--init", default="mean", choices=("mean", "zero"))
    parser.add_argument("--optimize-pose", action="store_true",
                        help="jointly refine a sim(3) pose correction "
                             "(robust to registration error in T_obj)")
    parser.add_argument("--views", type=int, default=0,
                        help="orbit renders of the fitted instance")
    parser.add_argument("--mesh", action="store_true")
    parser.add_argument("--out", default=None,
                        help="output dir (default <logdir>/fits)")
    args = parser.parse_args()

    enable_compilation_cache()
    from catnerf_tpu.loaders import load_scene
    from catnerf_tpu.train.checkpoint import (latest_checkpoint,
                                              restore_session_checkpoint)
    from catnerf_tpu.train.loop import TrainingSession

    cfg, inst_dict, sample_dict, cam = load_scene(args.config,
                                                  synthetic=args.synthetic)
    session = TrainingSession(cfg, inst_dict, sample_dict, cam=cam)
    ckpt = latest_checkpoint(os.path.join(args.logdir, "ckpt"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint under {args.logdir}/ckpt")
    restore_session_checkpoint(ckpt, session)

    if args.cls not in inst_dict or args.obj not in inst_dict[args.cls]:
        raise SystemExit(f"instance {args.obj} of category {args.cls} "
                         "not in the dataset")
    info = inst_dict[args.cls][args.obj]
    T_obj = info.get("T_obj")
    if T_obj is None:
        # unregistered instance: register its observed cloud against the
        # union of the category's registered canonical clouds
        from catnerf_tpu.geometry.pointcloud import accumulate_pointcloud
        from catnerf_tpu.geometry.registration import register_new_instance

        registered = []
        for oid, oinfo in inst_dict[args.cls].items():
            if oid == args.obj or oinfo.get("T_obj") is None:
                continue
            pcs = oinfo.get("pcs")
            if pcs is None:
                pcs = accumulate_pointcloud(oid, oinfo["frame_info"],
                                            sample_dict, cam)
            registered.append((pcs, oinfo["T_obj"]))
        if not registered:
            raise SystemExit(f"instance {args.obj} has no T_obj and no "
                             "registered sibling instances to align to")
        pcs_new = accumulate_pointcloud(args.obj, info["frame_info"],
                                        sample_dict, cam)
        T_obj, cd = register_new_instance(registered, pcs_new)
        print(f"registered new instance {args.obj} to the category "
              f"canonical frame (chamfer {cd:.4f})")

    res = fit_instance(session, args.cls, info["frame_info"], sample_dict,
                       cam, T_obj, args.obj, steps=args.steps,
                       n_rays=args.n_rays, lr=args.lr, init=args.init,
                       optimize_pose=args.optimize_pose)
    print(f"fit obj {args.obj} (cls {args.cls}): {res.steps} steps, "
          f"psnr {res.init_psnr:.2f} -> {res.final_psnr:.2f} "
          f"(loss {res.init_loss:.3f} -> {res.final_loss:.3f})")

    out = args.out or os.path.join(args.logdir, "fits")
    if args.views > 0:
        from catnerf_tpu.render_views import (_save, default_orbit_cam,
                                              orbit_frame, orbit_poses,
                                              render_view)

        params = session.category_params(args.cls)
        s = abs(np.linalg.det(res.T_obj[:3, :3])) ** (1 / 3)
        ext_c = np.asarray(res.extent) / max(s, 1e-9)  # canonical extent
        radius, near, far = orbit_frame(ext_c)
        # mask to the fitted instance's canonical box (1.3x margin, the
        # shared rule): the category field is untrained outside it
        mask = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                (1.3 * ext_c / 2).astype(np.float32))
        for v, T in enumerate(orbit_poses(args.views, radius)):
            img, depth, alpha = render_view(
                params, cfg, T, cam=default_orbit_cam(320, 240),
                near=near, far=far, shape_code=res.shape_code,
                texture_code=res.texture_code, n_bins=96, mask_box=mask)
            _save(out, f"obj{args.obj}_fit_view{v:02d}", img, depth, alpha)
        print(f"wrote {args.views} views to {out}")
    if args.mesh:
        from catnerf_tpu.mesher.meshing import adaptive_grid_dim, mesh_field

        dim = adaptive_grid_dim(res.extent, cfg.live_voxel_size,
                                cfg.grid_dim)
        params = session.category_params(args.cls)
        mesh = mesh_field(params, cfg, grid_dim=dim, is_background=False,
                          shape_code=res.shape_code,
                          texture_code=res.texture_code, extent=res.extent)
        if mesh is None:
            print("mesh: no iso-surface")
        else:
            os.makedirs(out, exist_ok=True)
            path = os.path.join(out, f"obj{args.obj}_fit.obj")
            mesh.export(path)
            print(f"mesh: {path}")


if __name__ == "__main__":
    main()
