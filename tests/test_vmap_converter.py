"""vMAP `.pth` checkpoint converter golden test.

Builds a torch checkpoint in the exact on-disk format the reference's
pretrained vMAP fields use (keys per src/category_registration.py:81-92 /
src/model.py:86-122), converts it with `load_vmap_pth`, and checks the JAX
forward on converted weights against an independent torch forward to ~1e-5 —
a cross-framework golden parity check of both the converter and the
OccupancyMap/UniDirsEmbed semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from catnerf_tpu.models import embedding, occupancy  # noqa: E402
from catnerf_tpu.train.checkpoint import load_vmap_pth  # noqa: E402

HIDDEN = 32
EMB1, EMB2 = 87, 42


def _torch_fc_state(rng):
    def lin(key, i, o, bias=True):
        w = torch.tensor(rng.normal(0, 0.3, (o, i)).astype(np.float32))
        out = {f"{key}.weight": w}
        if bias:
            out[f"{key}.bias"] = torch.tensor(
                rng.normal(0, 0.1, (o,)).astype(np.float32))
        return out

    sd = {}
    sd.update(lin("in_layer.0", EMB1, HIDDEN))
    sd.update(lin("mid1.0.0", HIDDEN, HIDDEN))
    sd.update(lin("cat_layer.0", HIDDEN + EMB1, HIDDEN))
    sd.update(lin("mid2.0.0", HIDDEN, HIDDEN))
    sd.update(lin("out_alpha", HIDDEN, 1))
    sd.update(lin("color_linear.0", HIDDEN + EMB2, HIDDEN))
    sd.update(lin("out_color", HIDDEN, 3))
    return sd


def _torch_forward(fc_sd, pe_B, x, scale):
    """Independent torch implementation of UniDirsEmbed + OccupancyMap
    (written from the architecture spec, per src/embedding.py:43-92 and
    src/model.py:86-155)."""
    t = x / scale
    proj = t @ pe_B.T  # [n, 21]
    bands = 2.0 ** torch.arange(6, dtype=torch.float32)
    xb = (proj[:, None, :] * bands[:, None]).reshape(x.shape[0], -1)
    emb = torch.cat([t, torch.sin(np.pi * xb)], dim=-1)  # [n, 129]
    x1, x2 = emb[:, :EMB1], emb[:, EMB1:]

    def lin(key, v):
        return v @ fc_sd[f"{key}.weight"].T + fc_sd[f"{key}.bias"]

    fc = torch.relu(lin("in_layer.0", x1))
    fc = torch.relu(lin("mid1.0.0", fc))
    fc = torch.relu(lin("cat_layer.0", torch.cat([fc, x1], dim=-1)))
    fc = torch.relu(lin("mid2.0.0", fc))
    alpha = lin("out_alpha", fc) * 10.0
    h = torch.relu(lin("color_linear.0", torch.cat([fc, x2], dim=-1)))
    color = torch.sigmoid(lin("out_color", h))
    return alpha[:, 0], color


def test_vmap_pth_roundtrip_forward_parity(tmp_path):
    rng = np.random.default_rng(0)
    fc_sd = _torch_fc_state(rng)
    pe_B = torch.tensor(rng.normal(0, 1, (21, 3)).astype(np.float32))
    bbox = rng.normal(0, 1, (2, 3)).astype(np.float32)
    ckpt = {
        "FC_state_dict": fc_sd,
        "PE_state_dict": {"B_layer.weight": pe_B},
        "obj_scale": 1.7,
        "bbox": bbox,
    }
    path = os.path.join(str(tmp_path), "obj_9999.pth")
    torch.save(ckpt, path)

    field = load_vmap_pth(path)
    assert field["obj_scale"] == pytest.approx(1.7)
    np.testing.assert_array_equal(field["bbox"], bbox)
    # torch Linear weights are (out, in); ours (in, out)
    assert field["fc"]["in_layer"]["w"].shape == (EMB1, HIDDEN)
    assert field["pe"]["B"].shape == (21, 3)

    x = rng.normal(0, 1.2, (256, 3)).astype(np.float32)
    with torch.no_grad():
        alpha_t, color_t = _torch_forward(fc_sd, pe_B, torch.tensor(x), 1.7)

    emb = embedding.apply(field["pe"], jnp.asarray(x), scale=1.7)
    alpha_j, color_j = occupancy.apply(field["fc"], emb)

    np.testing.assert_allclose(np.asarray(alpha_j[..., 0]),
                               alpha_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(color_j), color_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pretrained_weightroot_uncertainty_path(tmp_path):
    """load_pretrained=True end-to-end: reference weight_root layout
    (<root>/ckpt/<obj_id>/*.pth) -> converter -> uncertainty scoring."""
    from catnerf_tpu.config import Config
    from catnerf_tpu.geometry.registration import get_uncertainty_fields

    rng = np.random.default_rng(1)
    obj_id = 7
    ckpt_dir = os.path.join(str(tmp_path), "ckpt", str(obj_id))
    os.makedirs(ckpt_dir)
    torch.save({
        "FC_state_dict": _torch_fc_state(rng),
        "PE_state_dict": {"B_layer.weight": torch.tensor(
            rng.normal(0, 1, (21, 3)).astype(np.float32))},
        "obj_scale": 1.0,
        "bbox": rng.normal(0, 1, (2, 3)).astype(np.float32),
    }, os.path.join(ckpt_dir, "obj_7_iteration_2000.pth"))

    cfg = Config()
    cfg.weight_root = str(tmp_path)
    pts = rng.normal(0, 0.2, (500, 3)).astype(np.float32)
    inst_dict = {20: {obj_id: {"pcs": pts, "frame_info": []}}}
    bbox3d, counts, fields = {}, {}, {}
    get_uncertainty_fields(inst_dict, bbox3d, counts, fields, cfg,
                           load_pretrained=True)
    assert obj_id in fields[20]
    assert 0 <= counts[20][obj_id] <= 10000
    assert bbox3d[20][obj_id] is not None


def test_export_reference_checkpoints_roundtrip(tmp_path):
    """export_reference_checkpoints writes the reference's per-category .pth
    schema; weights round-trip (torch (out,in) <-> ours (in,out)) and the
    background file re-imports through load_vmap_pth with matching forward."""
    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.checkpoint import (
        export_reference_checkpoints, load_vmap_pth)
    from catnerf_tpu.train.loop import TrainingSession

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=2, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=6)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    files = export_reference_checkpoints(sess, str(tmp_path), 100)
    assert len(files) == len(sess.cls_ids) + 1

    cls_id = sess.cls_ids[0]
    raw = torch.load(
        os.path.join(str(tmp_path), f"cls_{cls_id}_iteration_00100.pth"),
        weights_only=False)
    assert raw["global_step"] == 100 and raw["cls_id"] == cls_id
    p = sess.category_params(cls_id)
    np.testing.assert_array_equal(
        raw["FC_state_dict"]["encoding_xyz.0.weight"].numpy(),
        np.asarray(p["fc"]["encoding_xyz"]["w"]).T)
    np.testing.assert_array_equal(
        raw["FC_state_dict"]["rgb.2.bias"].numpy(),
        np.asarray(p["fc"]["rgb_1"]["b"]))
    np.testing.assert_array_equal(
        raw["shape_code_state_dict"]["weight"].numpy(),
        np.asarray(p["shape_codes"]))
    assert "obj_tensor_dict" in raw and "instance_id_to_index" in raw

    # background file is load_vmap_pth-compatible (same OccupancyMap schema)
    field = load_vmap_pth(
        os.path.join(str(tmp_path), "cls_0_iteration_00100.pth"))
    bp = sess.background_params()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        field["fc"], bp["fc"])
    np.testing.assert_array_equal(field["pe"]["B"], np.asarray(bp["pe"]["B"]))


def test_vmap_pth_multiblock(tmp_path):
    """A vMAP checkpoint trained with hidden_layers_block=2 (two fc_blocks
    per mid Sequential) must convert with BOTH blocks — the converter
    infers block counts from the keys instead of assuming one."""
    rng = np.random.default_rng(1)

    def lin(key, i, o):
        return {
            f"{key}.weight": torch.tensor(
                rng.normal(0, 0.3, (o, i)).astype(np.float32)),
            f"{key}.bias": torch.tensor(
                rng.normal(0, 0.1, (o,)).astype(np.float32)),
        }

    sd = {}
    sd.update(lin("in_layer.0", EMB1, HIDDEN))
    sd.update(lin("mid1.0.0", HIDDEN, HIDDEN))
    sd.update(lin("mid1.1.0", HIDDEN, HIDDEN))
    sd.update(lin("cat_layer.0", HIDDEN + EMB1, HIDDEN))
    sd.update(lin("mid2.0.0", HIDDEN, HIDDEN))
    sd.update(lin("mid2.1.0", HIDDEN, HIDDEN))
    sd.update(lin("out_alpha", HIDDEN, 1))
    sd.update(lin("color_linear.0", HIDDEN + EMB2, HIDDEN))
    sd.update(lin("out_color", HIDDEN, 3))
    pe_B = torch.tensor(rng.normal(0, 1, (21, 3)).astype(np.float32))
    path = os.path.join(str(tmp_path), "obj_2b_100.pth")
    torch.save({"FC_state_dict": sd,
                "PE_state_dict": {"B_layer.weight": pe_B},
                "obj_scale": 1.0}, path)

    field = load_vmap_pth(path)
    assert len(field["fc"]["mid1"]) == 2
    assert len(field["fc"]["mid2"]) == 2

    # the forward consumes both blocks: zeroing the second must change it
    x = jnp.asarray(rng.normal(0, 1.0, (64, 3)).astype(np.float32))
    emb = embedding.apply(field["pe"], x, scale=1.0)
    a1, _ = occupancy.apply(field["fc"], emb)
    import copy as _copy

    f2 = _copy.deepcopy(field["fc"])
    f2["mid1"][1]["w"] = np.zeros_like(f2["mid1"][1]["w"])
    a2, _ = occupancy.apply(f2, emb)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
