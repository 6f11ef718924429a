"""Executed-reference L3 parity: ray-store construction + epoch cursor.

Closes the last unexecuted seam (VERDICT r3 item #2): the scene/sample
layer (L3) was verified only against our *reading* of the reference; here
the reference's OWN torch code is executed on a tiny synthetic fixture
with known sim(3) object poses and our buffers are asserted element-wise.

AST-extracted and executed (whole-module import needs skimage/imgviz/cv2):
  * `cameraInfo` + `origin_dirs_O` / `origin_dirs_W`
    (ref: src/scene_cateogries.py:24-47, 600-629),
  * the full `sceneCategory` class — bbox-crop flattening, pixel-state
    assignment, per-ray T_CO composition, build shuffle, and the
    `get_training_samples` epoch cursor
    (ref: src/scene_cateogries.py:100-451),
  * the sim(3) tensor helpers from src/utils.py:368-447 (with a one-token
    CPU-portability shim: `.to(quad.get_device())` -> `.to(quad.device)`,
    identical semantics on CUDA).

Asserted against catnerf_tpu.data.{camera,scene}:
  * camera ray cache bit-equal,
  * per-ray rgb / pixel-state / depth / instance-index buffers exactly
    equal in construction order (both build shuffles inverted from their
    known seeds),
  * ray origins/dirs: the reference's origin_dirs_O(T_CO, dirs_C) on its
    own stored per-ray T_CO vs our precomposed object-frame rays — a
    misread sign/order/scale in the T_CO composition shows up here as an
    O(1) mismatch (float32 matrix-inverse noise is ~1e-5),
  * world-frame paths: single-instance categories and the background
    (origin_dirs_W over per-frame T_WC),
  * sim(3) object tensors (scale+quat+t) equal,
  * the epoch-shuffle cursor: with both sides driven by the SAME injected
    permutation sequence, per-draw consumed rays are identical across
    multiple reshuffle epochs — including the reference's `>= N - n`
    early-reshuffle quirk (src/scene_cateogries.py:439).

The reference dir is read-only public content; only these pure-torch
pieces are executed, nothing is imported at module scope.
"""

from __future__ import annotations

import ast
import os
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from catnerf_tpu.config import Config  # noqa: E402
from catnerf_tpu.data.camera import CameraInfo  # noqa: E402
from catnerf_tpu.data.scene import CategoryScene  # noqa: E402
from catnerf_tpu.data.synthetic import make_scene  # noqa: E402

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available")

REF_SEED = 1234


class _TorchProxy:
    """Module-shaped torch stand-in for the exec namespace: delegates every
    attribute to the real torch but lets a test swap `randperm` so the
    reference's epoch reshuffle can be driven by a known permutation
    sequence (the only RNG the cursor semantics depend on)."""

    def __init__(self):
        self._randperm = torch.randperm

    def __getattr__(self, name):
        if name == "randperm":
            return self._randperm
        return getattr(torch, name)


@pytest.fixture(scope="module")
def ref_scene():
    """Extract + exec the reference's L3 code with a stub trainer module."""
    path = os.path.join(REF_SRC, "scene_cateogries.py")
    src = open(path).read()
    tree = ast.parse(src)
    pieces = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in (
                "origin_dirs_O", "origin_dirs_W", "stratified_bins",
                "normal_bins_sampling", "sceneCategory", "cameraInfo"):
            pieces[node.name] = ast.get_source_segment(src, node)
    assert set(pieces) == {"origin_dirs_O", "origin_dirs_W",
                           "stratified_bins", "normal_bins_sampling",
                           "sceneCategory", "cameraInfo"}

    upath = os.path.join(REF_SRC, "utils.py")
    usrc = open(upath).read()
    utree = ast.parse(usrc)
    upieces = {}
    for node in utree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "get_tensor_from_transform_sim3",
                "get_transform_from_tensor_sim3",
                "get_tensor_from_transform", "get_transform_from_tensor",
                "quad2rotation"):
            upieces[node.name] = ast.get_source_segment(usrc, node)
    assert len(upieces) == 5
    # CPU-portability shim (reference always runs CUDA): get_device()
    # returns -1 on cpu tensors, which .to() rejects; .to(quad.device) is
    # the identical device on every backend.
    patched = upieces["quad2rotation"].replace(
        ".to(quad.get_device())", ".to(quad.device)")
    assert patched != upieces["quad2rotation"]
    upieces["quad2rotation"] = patched

    from scipy.spatial.transform import Rotation

    tproxy = _TorchProxy()
    stub_trainer = types.ModuleType("stub_trainer")

    class _Trainer:
        def __init__(self, cfg, cls_id, obj_ids):
            self.inst_id_to_index = {i: obj_ids.index(i) for i in obj_ids}

    stub_trainer.Trainer = _Trainer

    ns = {"torch": tproxy, "np": np, "copy": __import__("copy"),
          "Rotation": Rotation, "trainer": stub_trainer}
    for name in ("quad2rotation", "get_transform_from_tensor",
                 "get_tensor_from_transform", "get_tensor_from_transform_sim3",
                 "get_transform_from_tensor_sim3"):
        exec(upieces[name], ns)  # noqa: S102 — vetted reference source
    for name in ("origin_dirs_O", "origin_dirs_W", "stratified_bins",
                 "normal_bins_sampling", "cameraInfo", "sceneCategory"):
        exec(pieces[name], ns)  # noqa: S102 — vetted reference source
    ns["_torch_proxy"] = tproxy
    return ns


@pytest.fixture(scope="module")
def fixture_scene():
    """Tiny synthetic scene; category 2 reduced to ONE instance so the
    single-instance world-frame path (t_wc_batch_all + origin_dirs_W,
    ref:240-241,430-432) is exercised alongside the multi-instance
    canonical-frame path."""
    scene = make_scene(n_frames=3, width=40, height=30, n_categories=2,
                       insts_per_cat=2, seed=7)
    cls_ids = sorted(c for c in scene.inst_dict if c != 0)
    single_cls = cls_ids[1]
    keep = sorted(scene.inst_dict[single_cls])[0]
    scene.inst_dict[single_cls] = {keep: scene.inst_dict[single_cls][keep]}
    return scene


def _stub_cfg(cfg: Config, cam) -> SimpleNamespace:
    return SimpleNamespace(
        data_device="cpu", training_device="cpu",
        bg_scale=cfg.bg_scale, obj_scale=cfg.obj_scale,
        hidden_feature_size=cfg.net_hyperparams.W,
        hidden_feature_size_bg=cfg.hidden_feature_size_bg,
        n_bins_cam2surface=cfg.n_bins_cam2surface,
        n_bins_cam2surface_bg=cfg.n_bins_cam2surface_bg,
        n_bins=cfg.n_bins, min_depth=cfg.min_depth, max_depth=cfg.max_depth,
        surface_eps=cfg.surface_eps, stop_eps=cfg.stop_eps,
        W=cam.width, H=cam.height, fx=cam.fx, fy=cam.fy, cx=cam.cx,
        cy=cam.cy)


def _build_ref_category(ref_scene, cfg, scene, cls_id):
    """Construct the reference sceneCategory with a seeded global
    np.random so its build shuffle can be inverted."""
    stub = _stub_cfg(cfg, scene.cam)
    ref_cam = ref_scene["cameraInfo"](stub)
    np.random.seed(REF_SEED)
    sc = ref_scene["sceneCategory"](
        stub, cls_id,
        scene.inst_dict[cls_id] if cls_id != 0 else scene.inst_dict[0],
        scene.sample_dict, ref_cam.rays_dir_cache)
    return sc


def _ref_build_perm(n: int) -> np.ndarray:
    """The permutation np.random.shuffle applied inside the reference
    constructor (the one and only np.random draw there)."""
    np.random.seed(REF_SEED)
    idx = np.arange(n)
    np.random.shuffle(idx)
    return idx


def _our_unshuffled(cat: CategoryScene, cfg: Config, cls_id: int) -> dict:
    """CategoryScene buffers restored to construction order (RayBuffer
    shuffles once at build with rng(cfg.seed + cls_id))."""
    perm = np.random.default_rng(cfg.seed + cls_id).permutation(cat.buffer.n)
    inv = np.argsort(perm)
    return {k: v[inv] for k, v in cat.buffer.arrays.items()}


def test_camera_ray_cache_matches_reference(ref_scene, fixture_scene):
    cam = fixture_scene.cam
    stub = _stub_cfg(Config(), cam)
    ref_cam = ref_scene["cameraInfo"](stub)
    ours = CameraInfo(cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy)
    np.testing.assert_array_equal(ours.rays_dir_cache,
                                  ref_cam.rays_dir_cache.numpy())


def _assert_buffer_parity(ref_scene, cfg, scene, cls_id):
    sc = _build_ref_category(ref_scene, cfg, scene, cls_id)
    cat = CategoryScene(cfg, cls_id,
                        scene.inst_dict[cls_id] if cls_id != 0
                        else scene.inst_dict[0],
                        scene.sample_dict, scene.cam)
    ours = _our_unshuffled(cat, cfg, cls_id)

    if cls_id != 0:
        n = sc.rgbs_batch_all.shape[0]
        inv = np.argsort(_ref_build_perm(n))
        rgbs = sc.rgbs_batch_all.numpy()[inv]
        depth = sc.depth_batch_all.numpy()[inv]
        dirs_c = sc.ray_dirs_batch_all[inv]
        indices = sc.batch_indices_all.numpy()[inv]
    else:
        n = sc.rgbs_batch_dict[0].shape[0]
        inv = np.argsort(_ref_build_perm(n))
        rgbs = sc.rgbs_batch_dict[0].numpy()[inv]
        depth = sc.depth_batch_dict[0].numpy()[inv]
        dirs_c = sc.ray_dirs_batch_dict[0][inv]
        indices = np.zeros(n, np.int64)

    assert cat.buffer.n == n
    # rgb + pixel state + depth + instance index: exact (same crops, same
    # flattening order, same state rules incl. unknown=-1 -> 2)
    np.testing.assert_array_equal(ours["rgb"], rgbs[:, :3])
    np.testing.assert_array_equal(ours["state"], rgbs[:, 3])
    np.testing.assert_array_equal(ours["depth"], depth)
    if cls_id != 0:
        np.testing.assert_array_equal(ours["obj_idx"], indices)

    # origins/dirs: run the REFERENCE's own frame transform on its own
    # stored per-ray poses and compare against our precomposed rays.
    if cls_id != 0 and len(sc.obj_ids) > 1:
        t_co = sc.t_co_batch_all[inv]
        o_ref, d_ref = ref_scene["origin_dirs_O"](t_co, dirs_c)
    else:
        if cls_id != 0:
            t_wc = sc.t_wc_batch_all[inv]
        else:
            t_wc = sc.t_wc_batch_dict[0][
                sc.frame_batch_dict[0][inv].long()]
        o_ref, d_ref = ref_scene["origin_dirs_W"](t_wc, dirs_c)
    scale = max(1.0, float(np.abs(o_ref.numpy()).max()))
    np.testing.assert_allclose(ours["origins"], o_ref.numpy(),
                               atol=1e-3 * scale, rtol=1e-3)
    np.testing.assert_allclose(ours["dirs"], d_ref.numpy(),
                               atol=1e-3, rtol=1e-3)

    # sim(3) object tensors (scale + wxyz quat + t), multi-instance only
    if cls_id != 0:
        for iid in sc.obj_ids:
            if iid in getattr(sc, "object_tensor_dict", {}):
                ref_t = sc.object_tensor_dict[iid].numpy()
                our_t = np.asarray(cat.object_tensor_dict[iid], np.float32)
                # quaternion sign is a gauge freedom
                if np.dot(ref_t[1:5], our_t[1:5]) < 0:
                    our_t = np.concatenate([our_t[:1], -our_t[1:5],
                                            our_t[5:]])
                np.testing.assert_allclose(our_t, ref_t, atol=1e-5,
                                           rtol=1e-5)


def test_multi_instance_category_buffers_match(ref_scene, fixture_scene):
    cls_id = sorted(c for c in fixture_scene.inst_dict if c != 0)[0]
    assert len(fixture_scene.inst_dict[cls_id]) > 1
    _assert_buffer_parity(ref_scene, Config(), fixture_scene, cls_id)


def test_single_instance_category_buffers_match(ref_scene, fixture_scene):
    cls_id = sorted(c for c in fixture_scene.inst_dict if c != 0)[1]
    assert len(fixture_scene.inst_dict[cls_id]) == 1
    _assert_buffer_parity(ref_scene, Config(), fixture_scene, cls_id)


def test_background_buffers_match(ref_scene, fixture_scene):
    _assert_buffer_parity(ref_scene, Config(), fixture_scene, 0)


@pytest.mark.parametrize("exact_boundary", [False, True])
def test_epoch_cursor_matches_reference(ref_scene, fixture_scene,
                                        exact_boundary):
    """Drive the reference's get_training_samples and our RayBuffer.sample
    with the SAME permutation stream; the consumed rays (tagged by a
    unique float id planted in the depth column) must be identical draw
    by draw across several reshuffle epochs.

    exact_boundary=True trims both stores so n_draw divides N exactly:
    the cursor then LANDS on N - n_draw, exercising the reference's `>=`
    early-reshuffle quirk (src/scene_cateogries.py:439) — the case where
    a `>` implementation would diverge (verified: flipping our `>=` to
    `>` fails this variant)."""
    cfg = Config()
    cls_id = sorted(c for c in fixture_scene.inst_dict if c != 0)[0]
    sc = _build_ref_category(ref_scene, cfg, fixture_scene, cls_id)
    cat = CategoryScene(cfg, cls_id, fixture_scene.inst_dict[cls_id],
                        fixture_scene.sample_dict, fixture_scene.cam)

    n = sc.rgbs_batch_all.shape[0]
    assert cat.buffer.n == n
    if exact_boundary:
        n_draw0 = max(8, n // 7)
        n = (n // n_draw0) * n_draw0
        for name in ("rgbs_batch_all", "depth_batch_all",
                     "ray_dirs_batch_all", "t_co_batch_all",
                     "batch_indices_all"):
            setattr(sc, name, getattr(sc, name)[:n])
        cat.buffer.arrays = {k: v[:n] for k, v in cat.buffer.arrays.items()}
        cat.buffer.n = n
    tags = (np.arange(n, dtype=np.float32) + 1.0)

    # Plant identical position-tag sequences into both (post-build)
    # stores: the build shuffles already differ by seed, so the cursor
    # A/B compares POSITION sequences — two independently-reshuffled
    # columns (depth + indices) must stay mutually aligned on each side
    # and equal across sides draw by draw.
    sc.depth_batch_all = torch.tensor(tags)
    cat.buffer.arrays["depth"] = tags.copy()
    itags = np.arange(n, dtype=np.int64)
    sc.batch_indices_all = torch.from_numpy(itags.copy())
    cat.buffer.arrays["obj_idx"] = itags.astype(np.int32)

    # Shared permutation stream for every subsequent reshuffle.
    perm_rng = np.random.default_rng(99)
    perms = [perm_rng.permutation(n) for _ in range(8)]
    it_ref = iter(list(perms))
    it_ours = iter(list(perms))
    ref_scene["_torch_proxy"]._randperm = (
        lambda k, it=it_ref: torch.from_numpy(next(it).copy()))
    cat.buffer.rng = SimpleNamespace(
        permutation=lambda k, it=it_ours: next(it).copy())

    n_draw = max(8, n // 7)
    n_epochs_rays = 3 * n
    draws = n_epochs_rays // n_draw
    for step in range(draws):
        (_, ref_depth, _, _, _, _, ref_idx) = sc.get_training_samples(n_draw)
        ours = cat.buffer.sample(n_draw)
        np.testing.assert_array_equal(
            ours["depth"], ref_depth.numpy(),
            err_msg=f"cursor divergence at draw {step}")
        np.testing.assert_array_equal(
            ours["obj_idx"].astype(np.int64), ref_idx.numpy(),
            err_msg=f"index divergence at draw {step}")
