"""Latent-code editing (catnerf_tpu/edit.py): swap/interp semantics, the
render-equality invariant (the field depends on an instance only through
its codes), and the CLI end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from catnerf_tpu import edit
from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.render_views import look_at, render_view
from catnerf_tpu.train.loop import TrainingSession


@pytest.fixture(scope="module")
def session():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=4)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    for _ in range(3):
        sess.step_once()
    return sess


def test_edit_codes_swap_semantics(session):
    cls_id = session.cls_ids[0]
    cat = session.categories[0]
    a, b = cat.obj_ids[0], cat.obj_ids[1]
    sa, ta = edit.instance_codes(session, cls_id, a)
    sb, tb = edit.instance_codes(session, cls_id, b)
    assert not np.allclose(sa, sb)  # distinct instances, distinct codes

    sc, tc = edit.edit_codes(session, cls_id, a, texture_from=b)
    np.testing.assert_array_equal(sc, sa)
    np.testing.assert_array_equal(tc, tb)
    sc, tc = edit.edit_codes(session, cls_id, a, shape_from=b)
    np.testing.assert_array_equal(sc, sb)
    np.testing.assert_array_equal(tc, ta)


def test_interpolate_codes_endpoints_and_what(session):
    cls_id = session.cls_ids[0]
    cat = session.categories[0]
    a, b = cat.obj_ids[0], cat.obj_ids[1]
    sa, ta = edit.instance_codes(session, cls_id, a)
    sb, tb = edit.instance_codes(session, cls_id, b)

    s0, t0 = edit.interpolate_codes(session, cls_id, a, b, 0.0)
    np.testing.assert_array_equal(s0, sa)
    np.testing.assert_array_equal(t0, ta)
    s1, t1 = edit.interpolate_codes(session, cls_id, a, b, 1.0)
    np.testing.assert_array_equal(s1, sb)
    np.testing.assert_array_equal(t1, tb)
    sh, th = edit.interpolate_codes(session, cls_id, a, b, 0.5,
                                    what="texture")
    np.testing.assert_array_equal(sh, sa)  # shape untouched
    np.testing.assert_allclose(th, 0.5 * (ta + tb), rtol=1e-6)

    with pytest.raises(ValueError):
        edit.interpolate_codes(session, cls_id, a, b, 0.5, what="color")
    with pytest.raises(KeyError):
        edit.instance_codes(session, 9999, a)
    with pytest.raises(KeyError):
        edit.instance_codes(session, cls_id, 9999)


def test_full_swap_renders_the_donor(session):
    """Swapping BOTH codes of A to B's must render pixel-identically to B —
    the instance enters the field only through its codes."""
    cls_id = session.cls_ids[0]
    cat = session.categories[0]
    a, b = cat.obj_ids[0], cat.obj_ids[1]
    params = session.category_params(cls_id)
    cam = CameraInfo(32, 24, 28.0, 28.0, 16.0, 12.0)
    T = look_at((1.2, 0.4, 0.8))

    sc, tc = edit.edit_codes(session, cls_id, a, shape_from=b,
                             texture_from=b)
    sb, tb = edit.instance_codes(session, cls_id, b)
    img1, d1, _ = render_view(params, session.cfg, T, cam, near=0.3, far=3.0,
                              shape_code=sc, texture_code=tc, n_bins=8,
                              chunk=2048)
    img2, d2, _ = render_view(params, session.cfg, T, cam, near=0.3, far=3.0,
                              shape_code=sb, texture_code=tb, n_bins=8,
                              chunk=2048)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(d1, d2)

    # texture-only swap changes the image but keeps A's geometry (depth)
    sc, tc = edit.edit_codes(session, cls_id, a, texture_from=b)
    img3, d3, _ = render_view(params, session.cfg, T, cam, near=0.3, far=3.0,
                              shape_code=sc, texture_code=tc, n_bins=8,
                              chunk=2048)
    sa, ta = edit.instance_codes(session, cls_id, a)
    img_a, d_a, _ = render_view(params, session.cfg, T, cam, near=0.3,
                                far=3.0, shape_code=sa, texture_code=ta,
                                n_bins=8, chunk=2048)
    np.testing.assert_array_equal(d3, d_a)  # geometry: shape code only
    assert not np.array_equal(img3, img_a)  # appearance changed


def test_render_and_mesh_edit_write_outputs(session, tmp_path):
    cls_id = session.cls_ids[0]
    cat = session.categories[0]
    a, b = cat.obj_ids[0], cat.obj_ids[1]
    sc, tc = edit.interpolate_codes(session, cls_id, a, b, 0.5)
    written = edit.render_edit(session, cls_id, a, sc, tc, str(tmp_path),
                               "interp", donors=[b], n_views=2, width=32,
                               height=24, n_bins=8)
    assert len(written) == 2
    for name in written:
        assert os.path.exists(os.path.join(str(tmp_path), name + "_rgb.png"))

    path = edit.mesh_edit(session, cls_id, a, sc, tc,
                          str(tmp_path / "edit.obj"), donors=[b],
                          grid_dim=32)
    # a barely-trained field may have no iso-surface; the contract is
    # "path written or None", and if written the file must parse
    if path is not None:
        from catnerf_tpu.mesher.mesh import load_mesh

        m = load_mesh(path)
        assert len(m.vertices) > 0


def test_edit_cli_end_to_end(tmp_path):
    """train --synthetic (checkpoint) -> edit CLI: texture transfer +
    interpolation renders written."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    logdir = str(tmp_path / "logs")
    root = os.path.dirname(os.path.dirname(__file__))
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['train.py', '--synthetic',\n"
        f" '--logdir', {logdir!r}, '--max-iter', '7', '--log-iter', '3',\n"
        " '--save-iter', '6', '--mesh-it', '100', '--grid-dim', '32'];\n"
        "import train; train.main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:]

    out = str(tmp_path / "edits")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import sys; sys.argv = ['edit', '--logdir', %r, '--synthetic',\n"
        " '--cls', '80', '--obj', '1', '--texture-from', '2',\n"
        " '--views', '2', '--width', '32', '--height', '24',\n"
        " '--n-bins', '8', '--out', %r];\n"
        "from catnerf_tpu.edit import main; main()\n" % (logdir, out)
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:]
    files = os.listdir(out)
    assert any("original" in f for f in files)
    assert any("tex2" in f for f in files), files


def test_mean_codes_category_prior(session):
    cls_id = session.cls_ids[0]
    cat = session.categories[0]
    a, b = cat.obj_ids[0], cat.obj_ids[1]
    sa, ta = edit.instance_codes(session, cls_id, a)
    sb, tb = edit.instance_codes(session, cls_id, b)
    sm, tm = edit.mean_codes(session, cls_id)
    np.testing.assert_allclose(sm, 0.5 * (sa + sb), rtol=1e-6)
    np.testing.assert_allclose(tm, 0.5 * (ta + tb), rtol=1e-6)
    sz, tz = edit.mean_codes(session, cls_id, zero=True)
    assert not sz.any() and not tz.any()
    assert sz.shape == sa.shape and tz.shape == ta.shape
