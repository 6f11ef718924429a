"""Reference registration-cache interop (VERDICT r1 missing item #5).

Builds an inst_dict.pkl the way the REFERENCE would — bbox3D values pickled
as open3d.geometry.OrientedBoundingBox objects (simulated here with a fake
`open3d` module that is removed before loading, so unpickling genuinely
cannot import the class) — and checks the tolerant reader recovers the
bounds, and that the full Replica loader consumes such a cache end-to-end,
recomputing anything unrecoverable from the frames.
"""

from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np

from catnerf_tpu.data.interop import (
    load_reference_inst_dict,
    repair_inst_dict,
)


def _fake_open3d_obb(center, R, extent, style):
    """An object whose pickle payload references open3d.geometry.* classes.
    Two styles cover the pickling shapes in the wild: dict state
    (__dict__-based) and tuple state (__getstate__-based)."""
    mod = sys.modules.get("open3d.geometry")
    if style == "dict":
        obj = mod.OrientedBoundingBox()
        obj.center = np.asarray(center, np.float64)
        obj.R = np.asarray(R, np.float64)
        obj.extent = np.asarray(extent, np.float64)
        return obj
    obj = mod.OrientedBoundingBoxTuple()
    obj._payload = (np.asarray(center, np.float64),
                    np.asarray(R, np.float64),
                    np.asarray(extent, np.float64),
                    np.ones(3))  # color-like extra vector
    return obj


class _FakeOBB:
    pass


class _FakeOBBTuple:
    def __getstate__(self):
        return self._payload

    def __setstate__(self, state):
        self._payload = state


def _install_fake_open3d():
    geom = types.ModuleType("open3d.geometry")
    # pose the module-level classes as open3d's so the pickle payload
    # references "open3d.geometry.OrientedBoundingBox*"
    _FakeOBB.__module__ = "open3d.geometry"
    _FakeOBB.__qualname__ = "OrientedBoundingBox"
    _FakeOBBTuple.__module__ = "open3d.geometry"
    _FakeOBBTuple.__qualname__ = "OrientedBoundingBoxTuple"
    geom.OrientedBoundingBox = _FakeOBB
    geom.OrientedBoundingBoxTuple = _FakeOBBTuple
    o3d = types.ModuleType("open3d")
    o3d.geometry = geom
    sys.modules["open3d"] = o3d
    sys.modules["open3d.geometry"] = geom


def _remove_fake_open3d():
    sys.modules.pop("open3d", None)
    sys.modules.pop("open3d.geometry", None)


def test_tolerant_reader_recovers_obbs(tmp_path):
    center = np.array([0.5, -0.2, 1.0])
    R = np.eye(3)
    extent = np.array([0.6, 0.4, 0.8])

    _install_fake_open3d()
    try:
        inst_dict = {
            0: {"frame_info": [{"frame": 0, "bbox": np.array([0, 4, 0, 4])}],
                "bbox3D": _fake_open3d_obb([0, 0, 0], R, [6, 3, 6], "dict")},
            80: {1: {"frame_info": [], "T_obj": np.eye(4),
                     "bbox3D": _fake_open3d_obb(center, R, extent, "dict")},
                 2: {"frame_info": [], "T_obj": np.eye(4),
                     "bbox3D": _fake_open3d_obb(center, R, extent,
                                                "tuple")}},
        }
        path = str(tmp_path / "inst_dict.pkl")
        with open(path, "wb") as f:
            pickle.dump(inst_dict, f)
    finally:
        _remove_fake_open3d()

    # plain pickle.load must fail (proves the fixture simulates the problem)
    try:
        with open(path, "rb") as f:
            pickle.load(f)
        assert False, "expected ModuleNotFoundError"
    except ModuleNotFoundError:
        pass

    loaded = load_reference_inst_dict(path)
    for style_obj in (loaded[80][1]["bbox3D"], loaded[80][2]["bbox3D"]):
        assert style_obj is not None
        np.testing.assert_allclose(style_obj.center, center)
        np.testing.assert_allclose(style_obj.R, R)
        np.testing.assert_allclose(style_obj.extent, extent)
    np.testing.assert_allclose(loaded[0]["bbox3D"].extent, [6, 3, 6])
    # T_obj / frame_info round-trip untouched
    np.testing.assert_array_equal(loaded[80][1]["T_obj"], np.eye(4))
    assert loaded[0]["frame_info"][0]["frame"] == 0


def test_replica_loader_consumes_reference_cache(tmp_path):
    """Full loader path: a reference-style cache with UNRECOVERABLE bounds
    (opaque stub state) loads, and repair recomputes them from frames."""
    from catnerf_tpu.config import Config
    from catnerf_tpu.data.replica import Replica
    from catnerf_tpu.data.synthetic import make_scene

    sys.path.insert(0, os.path.dirname(__file__))
    try:
        from test_replica_fixture import write_replica_layout
    finally:
        sys.path.remove(os.path.dirname(__file__))  # no leak into later tests

    cfg = Config()
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=2,
                       insts_per_cat=2, seed=4)
    cfg.dataset_dir = str(tmp_path)
    cfg.width, cfg.height = 64, 48
    cfg.fx = cfg.fy = scene.cam.fx
    cfg.cx, cfg.cy = scene.cam.cx, scene.cam.cy
    cfg.load_registration_result = True
    write_replica_layout(scene, str(tmp_path), cfg.depth_scale)

    # build the cache: keep real T_obj (from the synthetic GT registration
    # artifacts) but strip every bbox3D to opaque/None, as if the pickled
    # open3d objects were unrecoverable
    cache = {}
    for cls_id, inst_cls in scene.inst_dict.items():
        if cls_id == 0:
            cache[0] = {"frame_info": inst_cls["frame_info"], "bbox3D": None}
        else:
            cache[cls_id] = {
                iid: {"frame_info": info["frame_info"],
                      "T_obj": info["T_obj"], "bbox3D": None}
                for iid, info in inst_cls.items()
            }
    with open(os.path.join(str(tmp_path), "inst_dict.pkl"), "wb") as f:
        pickle.dump(cache, f)

    data = Replica(cfg)
    for cls_id, inst_cls in data.inst_dict.items():
        if cls_id == 0:
            assert inst_cls["bbox3D"] is not None
            continue
        for iid, info in inst_cls.items():
            assert info["bbox3D"] is not None, (cls_id, iid)
            s = next(sp for sp in scene.spheres if sp.inst_id == iid)
            # recomputed extent is metric (observed part of the sphere):
            # positive, floored at 10 cm, bounded by the true diameter+slack
            ext = np.asarray(info["bbox3D"].extent)
            assert (ext >= 0.0999).all()
            assert ext.max() <= 2.0 * s.radius * 1.2 + 0.02, (iid, ext)

    # trains end-to-end on the repaired dict
    from catnerf_tpu.train.loop import TrainingSession

    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    sess = TrainingSession(cfg, data.inst_dict, data.sample_dict)
    m = sess.step_once()
    assert np.isfinite(float(m.total))
