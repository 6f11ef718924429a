"""Config surface: reference-schema parsing of the new keys, validation,
and the one-switch strict-parity preset (PARITY.md §"Deliberate
divergences & strict-parity recipe")."""

from __future__ import annotations

import dataclasses

import pytest

from catnerf_tpu.config import Config

# the flags apply_strict_parity() must flip OFF — keep in sync with
# PARITY.md's divergence table
STRICT_PARITY_FLAGS = (
    "mesh_fill_interior",
    "mesh_adaptive_bounds",
    "mesh_space_carving",
    "mesh_category_extent",
    "scale_aware_registration",
    "appearance_tie_break",
    "refined_mask_unknown",
    "bf16_activations",
    "use_fused_kernels",
)
# non-boolean divergences apply_strict_parity() must reset to the
# reference's value
STRICT_PARITY_VALUES = {
    "seg_propagation_rounds": 1,  # ref: single-hop (src/utils.py:643-671)
}


def _flat(cfg: Config) -> dict:
    d = dict(cfg.__dict__)
    d["net_hyperparams"] = dataclasses.asdict(cfg.net_hyperparams)
    return d


def test_strict_parity_flips_exactly_the_documented_flags():
    base = Config()
    strict = Config().apply_strict_parity()
    strict.validate()
    a, b = _flat(base), _flat(strict)
    changed = {k for k in a if a[k] != b[k]}
    # use_fused_kernels is already False by default -> not in `changed`
    expected = {f for f in STRICT_PARITY_FLAGS
                if getattr(base, f) is not False}
    expected |= {k for k, v in STRICT_PARITY_VALUES.items()
                 if getattr(base, k) != v}
    assert changed == expected
    for f in STRICT_PARITY_FLAGS:
        assert getattr(strict, f) is False, f
    for k, v in STRICT_PARITY_VALUES.items():
        assert getattr(strict, k) == v, k


def test_reference_dict_parses_new_keys():
    cfg = Config.from_reference_dict({
        "dataset": {"format": "Replica", "path": "/nonexistent",
                    "frame_stride": 10},
        "vis": {"mesh_method": "tetra"},
    })
    assert cfg.frame_stride == 10
    assert cfg.mesh_method == "tetra"
    cfg.validate()


def test_validate_rejects_bad_values():
    cfg = Config()
    cfg.frame_stride = 0
    with pytest.raises(ValueError, match="frame_stride"):
        cfg.validate()
    cfg = Config()
    cfg.mesh_method = "lewiner"
    with pytest.raises(ValueError, match="mesh_method"):
        cfg.validate()


def test_shipped_scene_config_parses_and_validates():
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = Config.from_json(os.path.join(
        root, "configs", "Replica", "config_replica_room0.json"))
    cfg.validate()
    assert cfg.dataset_format == "Replica"
    assert cfg.frame_stride == 1  # not set in shipped configs -> default
    assert cfg.mesh_method == "mc"
