"""CLI + checkpoint/resume tests."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train import checkpoint as ckpt_mod
from catnerf_tpu.train.loop import TrainingSession


def _session():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    cfg.n_per_optim = 24
    cfg.n_per_optim_bg = 64
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=3)
    return TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    sess = _session()
    sess.run(5, callback_every=100)
    path = ckpt_mod.save_checkpoint(str(tmp_path / "ckpt"), sess.state, 5)
    assert os.path.exists(path)
    assert ckpt_mod.latest_checkpoint(str(tmp_path / "ckpt")) == path

    sess2 = _session()  # fresh session (same seed => identical init)
    restored = ckpt_mod.load_checkpoint(path, sess2.state)
    assert int(restored.step) == 5
    # params identical to saved
    for a, b in zip(jax.tree_util.tree_leaves(sess.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (resume is real, unlike the reference)
    for a, b in zip(jax.tree_util.tree_leaves(sess.state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state
    sess2.state = restored
    sess2.iteration = int(restored.step)
    m = sess2.step_once()
    assert np.isfinite(float(m.total))


def test_reference_ckpt_export_import_roundtrip(tmp_path):
    """export_reference_checkpoints -> import_reference_checkpoints restores
    params bitwise into a fresh session (VERDICT r1 item #3). Exercises the
    reference .pth schema (src/scene_cateogries.py:548-597) both ways."""
    torch = pytest.importorskip("torch")  # noqa: F841

    sess = _session()
    sess.run(3, callback_every=100)
    path = str(tmp_path / "ref_ckpt")
    written = ckpt_mod.export_reference_checkpoints(sess, path, 3)
    assert len(written) == len(sess.cls_ids) + 1  # + background

    sess2 = _session()
    a0 = np.asarray(sess.state.params["cat_fc"]["sigma"]["w"])
    # same seed in _session => identical init; force divergence with one
    # extra step so the import below provably overwrites the params
    sess2.run(1, callback_every=100)
    b0 = np.asarray(sess2.state.params["cat_fc"]["sigma"]["w"])
    assert not np.allclose(a0, b0)

    step = ckpt_mod.import_reference_checkpoints(sess2, path)
    assert step == 3
    for k in ("cat_pe", "cat_fc", "bg_pe", "bg_fc"):
        for a, b in zip(jax.tree_util.tree_leaves(sess.state.params[k]),
                        jax.tree_util.tree_leaves(sess2.state.params[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for kind in ("shape", "texture"):
        # padded rows beyond real instances are not exported; compare the
        # real slots only
        for i, cat in enumerate(sess.categories):
            for slot in cat.inst_id_to_index.values():
                np.testing.assert_array_equal(
                    np.asarray(sess.state.params["codes"][kind][i, slot]),
                    np.asarray(sess2.state.params["codes"][kind][i, slot]))
    # per-category metadata carried over
    for c1, c2 in zip(sess.categories, sess2.categories):
        assert set(c1.extent_dict) == set(c2.extent_dict)
        for k in c1.extent_dict:
            np.testing.assert_allclose(np.asarray(c1.extent_dict[k]),
                                       np.asarray(c2.extent_dict[k]))
        for k in c1.object_tensor_dict:
            np.testing.assert_allclose(
                np.asarray(c1.object_tensor_dict[k]),
                np.asarray(c2.object_tensor_dict[k]))

    # imported session meshes + continues training
    m = sess2.step_once()
    assert np.isfinite(float(m.total))


def test_train_cli_synthetic(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    logdir = str(tmp_path / "logs")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['train.py', '--synthetic',\n"
        f" '--logdir', {logdir!r}, '--max-iter', '13', '--log-iter', '4',\n"
        " '--save-iter', '6', '--mesh-it', '12', '--grid-dim', '48'];\n"
        "import train; train.main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode == 0, proc.stderr[-3000:]
    # metrics logged
    metrics_file = os.path.join(logdir, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    lines = [json.loads(l) for l in open(metrics_file)]
    assert len(lines) >= 2
    # checkpoint written
    assert ckpt_mod.latest_checkpoint(os.path.join(logdir, "ckpt")) is not None
    # meshes exported at iter 12
    mesh_dir = os.path.join(logdir, "scene_mesh")
    assert os.path.isdir(mesh_dir) and len(os.listdir(mesh_dir)) >= 1


def test_train_cli_synthetic_fast_path(tmp_path):
    """Superstep fast path: log/save/mesh boundaries aligned to log_iter."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    logdir = str(tmp_path / "logs_fast")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['train.py', '--synthetic',\n"
        f" '--logdir', {logdir!r}, '--max-iter', '13', '--log-iter', '4',\n"
        " '--save-iter', '8', '--mesh-it', '12', '--grid-dim', '48'];\n"
        "import train; train.main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the superstep path must actually have engaged (it silently falls
    # back to parity when the iter cadences misalign)
    assert "fast path: superstep" in proc.stdout, proc.stdout[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert len(lines) >= 2
    assert ckpt_mod.latest_checkpoint(os.path.join(logdir, "ckpt")) is not None
    mesh_dir = os.path.join(logdir, "scene_mesh")
    assert os.path.isdir(mesh_dir) and len(os.listdir(mesh_dir)) >= 1


def test_eval_cli_on_synthetic_fixture(tmp_path):
    """Exercise the eval protocol end-to-end with generated GT + rec meshes
    (Replica habitat layout, ref: metric/eval_3D_obj.py:130-160)."""
    from catnerf_tpu.metrics.eval_obj import eval_scene
    from catnerf_tpu.native.lib import geomlib
    from catnerf_tpu.mesher.mesh import TriMesh

    def sphere_mesh(radius, center, n=40):
        t = np.linspace(-1.5 * radius, 1.5 * radius, n)
        X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
        occ = 1 / (1 + np.exp((np.sqrt(X**2 + Y**2 + Z**2) - radius) * 30 / radius))
        v, f = geomlib.marching_cubes(occ.astype(np.float32), 0.5)
        v = v / (n - 1) * 3 * radius - 1.5 * radius + np.asarray(center)
        return TriMesh(v, f)

    data_dir = tmp_path / "Replica"
    log_dir = tmp_path / "logs"
    gt_dir = data_dir / "room_0" / "habitat"
    mesh_dir = log_dir / "room_0" / "scene_mesh"
    gt_dir.mkdir(parents=True)
    mesh_dir.mkdir(parents=True)

    # GT: objects 1, 2 + background walls (class 93)
    sphere_mesh(0.3, [1, 0, 0]).export_ply(str(gt_dir / "mesh_semantic.ply_1.ply"))
    sphere_mesh(0.4, [-1, 0, 0]).export_ply(str(gt_dir / "mesh_semantic.ply_2.ply"))
    sphere_mesh(3.0, [0, 0, 0]).export_ply(str(gt_dir / "mesh_semantic.ply_9.ply"))
    with open(gt_dir / "info_semantic.json", "w") as f:
        json.dump({"objects": [
            {"id": 1, "class_id": 20}, {"id": 2, "class_id": 20},
            {"id": 9, "class_id": 93},
        ]}, f)

    # rec meshes: slightly perturbed copies
    for oid, (r, c) in {1: (0.3, [1.01, 0, 0]), 2: (0.4, [-1, 0.01, 0]),
                        0: (3.0, [0, 0, 0])}.items():
        sphere_mesh(r, c).export(str(mesh_dir / f"iteration_100_obj{oid}.obj"))

    arr = eval_scene(str(data_dir), str(log_dir), "room_0", "Replica",
                     iteration=100)
    assert arr is not None
    assert arr.shape[0] == 3 and arr.shape[1] == 3  # 3 metrics x 3 objects
    acc, comp, ratio = arr[0].mean(), arr[1].mean(), arr[2].mean()
    assert acc < 5.0, acc         # cm
    assert comp < 5.0, comp
    assert ratio > 90.0, ratio    # %
    assert os.path.exists(log_dir / "room_0" / "eval_mesh" / "metrics_3D_obj.npy")


def test_benchmark_driver_scene_mapping():
    """run_benchmark derives eval-compatible scene names from configs."""
    import sys
    scripts_dir = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        from run_benchmark import scene_name
    finally:
        sys.path.remove(scripts_dir)  # don't leak into later tests

    assert scene_name("configs/Replica/config_replica_room0.json") == "room_0"
    assert scene_name("configs/Replica/config_replica_office3.json") == "office_3"
    sn = scene_name("configs/ScanNet/config_scannet_0066.json")
    assert sn.startswith("scene0066"), sn


def test_utils_timers_and_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from catnerf_tpu.utils import device_trace, performance_measure

    with performance_measure("unit"):
        pass
    with device_trace(str(tmp_path / "trace")):
        jax.block_until_ready(jnp.ones((8,)) * 2)
    assert os.path.isdir(tmp_path / "trace")


def test_train_cli_resume_mesh_only(tmp_path):
    """Regression: --resume --mesh-only must load the checkpoint BEFORE
    meshing (previously the mesh-only branch returned first and exported
    meshes of freshly initialized weights)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    logdir = str(tmp_path / "logs_rm")
    train_code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['train.py', '--synthetic',\n"
        f" '--logdir', {logdir!r}, '--max-iter', '7', '--log-iter', '3',\n"
        " '--save-iter', '6', '--mesh-it', '1000', '--grid-dim', '48'];\n"
        "import train; train.main()\n"
    )
    root = os.path.dirname(os.path.dirname(__file__))
    proc = subprocess.run([sys.executable, "-c", train_code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:]

    mesh_code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['train.py', '--synthetic',\n"
        f" '--logdir', {logdir!r}, '--resume', '--mesh-only',\n"
        " '--grid-dim', '48'];\n"
        "import train; train.main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", mesh_code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "resumed from" in proc.stdout, proc.stdout[-2000:]
    mesh_dir = os.path.join(logdir, "scene_mesh")
    assert os.path.isdir(mesh_dir) and len(os.listdir(mesh_dir)) >= 1


def test_importance_sampling_batched_contract():
    """Regression: the vestigial importance sampler (kept for reference API
    parity, ref: src/utils.py:495-526) crashed on its advertised [...,
    n_bins] batched input (jnp.searchsorted needs 1-D); the broadcast CDF
    inversion must match searchsorted on 1-D and support batching."""
    import jax
    import jax.numpy as jnp

    from catnerf_tpu.utils import importance_sampling_coords

    w = jnp.asarray(np.random.default_rng(0).random((4, 7, 16)))
    inds, u, cdf = importance_sampling_coords(jax.random.PRNGKey(0), w, 5)
    assert inds.shape == (4, 7, 5)
    assert int(inds.min()) >= 0 and int(inds.max()) < 16

    w1 = jnp.asarray(np.random.default_rng(1).random(16))
    i1, u1, c1 = importance_sampling_coords(jax.random.PRNGKey(1), w1, 50)
    ref = jnp.clip(jnp.searchsorted(c1, u1, side="right"), 0, 15)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ref))

    # det=True path is deterministic and sorted
    i2, _, _ = importance_sampling_coords(jax.random.PRNGKey(2), w, 5,
                                          det=True)
    assert (np.diff(np.asarray(i2), axis=-1) >= 0).all()
