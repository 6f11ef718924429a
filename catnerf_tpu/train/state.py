"""Training state: stacked category ensemble + background model + optimizer.

Replaces the reference's mutable module zoo + AdamW param groups
(ref: train.py:40-64, src/trainer.py:38-60) with one immutable pytree.
The parameter groups map to an optax multi_transform:
  'model' — category MLP + PE ensembles and the background model
            (lr=learning_rate, wd=weight_decay)
  'codes' — per-instance shape/texture latents
            (lr=code_learning_rate, wd=code_weight_decay)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, codes as codes_mod, embedding, ensemble, occupancy


class TrainState(NamedTuple):
    params: dict[str, Any]   # {'cat_pe', 'cat_fc', 'codes', ['bg_pe', 'bg_fc']}
    opt_state: Any
    step: jnp.ndarray        # scalar int32


def param_labels(params: dict[str, Any]) -> dict[str, Any]:
    """optax.multi_transform labels mirroring the reference param groups
    (ref: train.py:54-64)."""
    return {
        k: jax.tree_util.tree_map(lambda _: "codes" if k == "codes" else "model", v)
        for k, v in params.items()
    }


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW with the reference's two param groups (torch AdamW semantics:
    decoupled weight decay scaled by lr — optax.adamw matches)."""
    model_tx = optax.adamw(
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay
    )
    codes_tx = optax.adamw(
        learning_rate=cfg.code_learning_rate, weight_decay=cfg.code_weight_decay
    )
    return optax.multi_transform(
        {"model": model_tx, "codes": codes_tx}, param_labels
    )


def init_train_state(key: jax.Array, cfg: Config, n_objs_per_cls: list[int],
                     with_background: bool = True) -> TrainState:
    """Build stacked per-category params (PE + CodeNeRF + codes) and the
    background (PE + OccupancyMap) plus optimizer state.

    n_objs_per_cls: real instance counts per object category (excludes
    background). Codes are padded to max(n_objs_per_cls).
    """
    n_cls = len(n_objs_per_cls)
    nh = cfg.net_hyperparams
    n_objs = list(int(n) for n in n_objs_per_cls)

    # The RNG draws stay EAGER: jitting them lets XLA fuse the
    # normal*std scale-multiplies ~1 ULP differently (measured 3e-8 on
    # half the weight leaves), which would drift the loss-curve goldens.
    # Wrapping the WHOLE build in one jit was also measured SLOWER on the
    # TPU (96-131 s vs eager 77 s at 20 categories, warm persistent
    # cache: the Python trace of hundreds of ops plus a ~90 s XLA compile
    # are not amortized — tracing is never cached). The stacking and the
    # optimizer-moment init ARE jitted below: stack/zeros are exact, and
    # eagerly they were ~90 per-leaf dispatches each over the tunnel
    # (measured 24.4 s + 19.7 s of the 77 s).
    k_fc, k_codes, k_bg = jax.random.split(key, 3)
    # (vmapping init_params over the keys is bit-identical but measured
    # SLOWER end-to-end — its per-process trace + batched-op compiles
    # exceed the loop's op-cached eager dispatches: 45-46 s vs 37 s)
    fc_list = [
        codenerf.init_params(
            k, shape_blocks=nh.shape_blocks,
            texture_blocks=nh.texture_blocks,
            W=nh.W, latent_dim=nh.latent_dim,
        )
        for k in jax.random.split(k_fc, n_cls)
    ]
    stack = jax.jit(ensemble.stack_params)
    params: dict[str, Any] = {
        "cat_pe": stack([embedding.init_params() for _ in range(n_cls)]),
        "cat_fc": stack(fc_list),
        "codes": codes_mod.init_stacked_codes(k_codes, n_objs,
                                              nh.latent_dim),
    }
    if with_background:
        params["bg_pe"] = embedding.init_params()
        params["bg_fc"] = occupancy.init_params(
            k_bg, hidden_size=cfg.hidden_feature_size_bg
        )
    tx = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))
