"""Self-contained per-object occupancy-field pretraining.

The reference *requires* externally pretrained vMAP checkpoints for the
uncertainty-field template scoring and raises NotImplementedError without
them (ref: src/category_registration.py:93-94, README.md:50-51). This module
closes that gap: it trains a small vMAP-style OccupancyMap per object
directly from the object's own rays — all objects simultaneously via
`jax.vmap` over the object axis (the same ensembling used for category
training), one `lax.scan` superstep per dispatch.

Fields are trained in a cloud-centered world frame (origins shifted by the
instance point-cloud center) so positional-encoding frequencies are
well-conditioned; the returned field dict carries that `center` and
`uncertainty_score` shifts its spherical ray origins accordingly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.models import embedding, occupancy
from catnerf_tpu.ops import losses, sampling

HIDDEN = 32          # vMAP per-object field width (SURVEY §2.1 OccupancyMap)
N_BINS_C2S = 1
N_BINS = 9
LR = 1e-3


def build_object_ray_arrays(frame_info: list, sample_dict: dict,
                            cam: CameraInfo, this_id: int,
                            center: np.ndarray) -> dict:
    """World-frame (cloud-centered) ray arrays for one instance's bbox crops
    (the shared recipe: data/scene.py::build_instance_ray_arrays)."""
    from catnerf_tpu.data.scene import build_instance_ray_arrays

    return build_instance_ray_arrays(
        frame_info, sample_dict, cam, this_id,
        lambda T_wc: (T_wc[:3, :3], T_wc[:3, 3] - center))


def _init_field_params(key: jax.Array) -> dict:
    return {
        "pe": embedding.init_params(),
        "fc": occupancy.init_params(key, hidden_size=HIDDEN, do_color=True),
    }


def pretrain_object_fields(objects: list, sample_dict: dict, cam: CameraInfo,
                           cfg: Config, *, steps: int = 1000,
                           n_rays: int = 600, key: jax.Array | None = None,
                           n_inner: int = 100,
                           max_rays_per_obj: int = 200_000) -> list[dict]:
    """Train one occupancy field per object, all objects batched.

    objects: list of (this_id, frame_info, pcs) — instance mask id, frame
    list, accumulated world-frame point cloud. Returns one entry per
    object: a field dict {'pe', 'fc', 'obj_scale', 'center', 'bbox'} (the
    same contract as `checkpoint.load_vmap_pth` plus 'center'), or None for
    an object whose bbox crops yield zero ray rows (every frame crop
    degenerate) — training such an object would draw randint(0, 0) indices
    (undefined) and fit the field to zero-padding; callers route None to
    the geometric coverage fallback.
    """
    from catnerf_tpu.data.device_buffer import _pack_rows

    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    n_obj = len(objects)
    assert n_obj > 0

    centers, scales, arrays_l, bboxes = [], [], [], []
    for this_id, frame_info, pcs in objects:
        pts = np.asarray(pcs)
        center = (pts.max(0) + pts.min(0)) / 2.0
        extent = np.maximum(pts.max(0) - pts.min(0), 0.10)
        centers.append(center)
        scales.append(float(np.max(extent) / 2.0 * 1.2))
        bboxes.append(np.stack([pts.min(0), pts.max(0)]))
        arrays_l.append(build_object_ray_arrays(
            frame_info, sample_dict, cam, this_id, center))

    # Cap per-object buffers (uniform random subsample) so one huge object
    # cannot blow up the padded [n_obj, max_len, 11] stack on HBM.
    rng = np.random.default_rng(cfg.seed)
    for i, a in enumerate(arrays_l):
        n = a["depth"].shape[0]
        if n > max_rays_per_obj:
            sel = rng.choice(n, max_rays_per_obj, replace=False)
            arrays_l[i] = {k2: v[sel] for k2, v in a.items()}

    # drop zero-ray objects from the training batch (see docstring)
    keep = [i for i, a in enumerate(arrays_l) if a["depth"].shape[0] > 0]
    if len(keep) < n_obj:
        dropped = [objects[i][0] for i in range(n_obj) if i not in keep]
        print(f"field pretrain: object(s) {dropped} have no valid "
              "bbox-crop rays; deferring them to coverage scoring")
        if not keep:
            return [None] * n_obj
        slot = {orig: j for j, orig in enumerate(keep)}
        centers = [centers[i] for i in keep]
        scales = [scales[i] for i in keep]
        bboxes = [bboxes[i] for i in keep]
        arrays_l = [arrays_l[i] for i in keep]
        full_n = n_obj
        n_obj = len(keep)
    else:
        slot = {i: i for i in range(n_obj)}
        full_n = n_obj
    max_len = max(a["depth"].shape[0] for a in arrays_l)
    packed = np.zeros((n_obj, max_len, 11), np.float32)
    lengths = np.zeros((n_obj,), np.int32)
    for i, a in enumerate(arrays_l):
        n = a["depth"].shape[0]
        packed[i, :n] = _pack_rows(a, n, with_obj=False)
        lengths[i] = n
    packed_d = jnp.asarray(packed)
    lengths_d = jnp.asarray(lengths)
    scales_d = jnp.asarray(scales, jnp.float32)

    keys = jax.random.split(key, n_obj + 1)
    key, init_keys = keys[0], keys[1:]
    params = jax.vmap(_init_field_params)(init_keys)
    tx = optax.adamw(LR, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    sample_fn = partial(
        sampling.sample_3d_points, n_bins_cam2surface=N_BINS_C2S,
        n_bins=N_BINS, min_depth=cfg.min_depth,
        surface_eps=cfg.surface_eps, stop_eps=cfg.stop_eps)

    # The ray store / lengths / scales are ARGUMENTS of the jitted superstep,
    # never closed over: a closed-over device array is embedded in the
    # program as an MLIR constant, which (a) pulls it device->host during
    # lowering — 80+ s for the [n_obj, max_len, 11] store over the axon
    # tunnel (measured: 254 s of a 305 s pretrain were constant pulls,
    # scripts profile 2026-08) — and (b) ships it back inside the compiled
    # binary every compile.
    @jax.jit
    def superstep(carry, k, packed_d, lengths_d, scales_d):
        def loss_fn(params, rows, k):
            keys = jax.random.split(k, n_obj)
            rays = jax.vmap(sample_fn)(
                keys, rows[..., 6:9], rows[..., 10].astype(jnp.int32),
                rows[..., 9], rows[..., 0:3], rows[..., 3:6])

            def fwd(p, pcs, scale):
                emb = embedding.apply(p["pe"], pcs, scale=scale)
                a, c = occupancy.apply(p["fc"], emb)
                return a[..., 0], c

            alpha, color = jax.vmap(fwd)(params, rays.input_pcs, scales_d)
            lb = losses.step_batch_loss(
                alpha, color, rays.gt_depth, rays.gt_rgb, rays.obj_labels,
                rays.valid_depth_mask, rays.z_vals,
                color_scaling=cfg.color_scaling,
                opacity_scaling=cfg.opacity_scaling)
            return lb.total

        def one_step(carry, k):
            params, opt_state = carry
            k_draw, k_sample = jax.random.split(k)
            idx = jax.random.randint(k_draw, (n_obj, n_rays), 0,
                                     lengths_d[:, None])
            flat = (idx + (jnp.arange(n_obj) * max_len)[:, None]).reshape(-1)
            rows = jnp.take(packed_d.reshape(n_obj * max_len, 11), flat,
                            axis=0).reshape(n_obj, n_rays, 11)
            loss, grads = jax.value_and_grad(loss_fn)(params, rows, k_sample)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(k, n_inner)
        return jax.lax.scan(one_step, carry, keys)

    carry = (params, opt_state)
    n_chunks = max(1, -(-steps // n_inner))  # ceil: never trains fewer steps
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        carry, losses_hist = superstep(carry, k, packed_d, lengths_d,
                                       scales_d)
    params = carry[0]
    final_loss = float(losses_hist[-1])
    print(f"pretrained {n_obj} object fields: {n_chunks * n_inner} steps, "
          f"final loss {final_loss:.3f}")

    fields: list = [None] * full_n
    for orig, i in slot.items():
        p_i = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), params)
        fields[orig] = {
            "pe": p_i["pe"], "fc": p_i["fc"], "obj_scale": scales[i],
            "center": centers[i], "bbox": bboxes[i],
        }
    return fields
