"""Sharding rules + sharded train step.

Parity target: none — the reference is strictly single-device (no
torch.distributed/DDP anywhere; SURVEY.md §2.2). This layer preserves the
single-chip step's exact math (train/step.py, ref: train.py:98-201) while
adding the DP(rays) x EP(categories) multi-chip layout; equivalence is
asserted by tests/test_parallel.py::test_sharded_step_matches_single_device.

Layout:
  stacked category params / codes / their optimizer moments
      -> category axis sharded over 'model' (expert parallel)
  background params -> replicated
  category ray batch -> ('model', 'data'): categories over experts, rays DP
  background ray batch -> ('data',)
  metrics -> replicated

XLA inserts the gradient all-reduce over 'data' and keeps per-category
updates local to their 'model' shard; all collectives ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from catnerf_tpu.config import Config
from catnerf_tpu.train.state import TrainState, init_train_state
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch, make_train_step
from catnerf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def state_shardings(state: TrainState, mesh: Mesh, n_cls: int):
    """Pytree of NamedShardings for the train state: any leaf whose path
    passes through a category-stacked group ('cat_pe'/'cat_fc'/'codes') and
    whose leading dim equals n_cls is sharded over 'model'; everything else
    (background params, scalar optimizer counters) is replicated. The optax
    state mirrors the param tree, so the same rule covers the moments."""
    ep = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())

    def rule(path, leaf):
        keys = {getattr(p, "key", getattr(p, "name", None)) for p in path}
        stacked = keys & {"cat_pe", "cat_fc", "codes"}
        if stacked and getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n_cls:
            return ep
        return repl

    return jax.tree_util.tree_map_with_path(rule, state)


def batch_shardings(mesh: Mesh):
    cat = CategoryBatch(
        rgbs=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
        states=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
        depth=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
        origins=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
        dirs=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
        obj_indices=NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)),
    )
    bg = BackgroundBatch(
        rgbs=NamedSharding(mesh, P(DATA_AXIS)),
        states=NamedSharding(mesh, P(DATA_AXIS)),
        depth=NamedSharding(mesh, P(DATA_AXIS)),
        origins=NamedSharding(mesh, P(DATA_AXIS)),
        dirs=NamedSharding(mesh, P(DATA_AXIS)),
    )
    return cat, bg


def make_sharded_train_step(cfg: Config, obj_mask, mesh: Mesh,
                            state_template: TrainState, n_cls: int,
                            with_background: bool = True):
    """jit the train step with explicit in/out shardings over `mesh`."""
    inner = make_train_step(cfg, obj_mask, with_background=with_background,
                            jit=False)

    st_sh = state_shardings(state_template, mesh, n_cls)
    cat_sh, bg_sh = batch_shardings(mesh)
    repl = NamedSharding(mesh, P())
    metrics_sh = jax.tree_util.tree_map(
        lambda _: repl, _metrics_template()
    )
    return jax.jit(
        inner,
        in_shardings=(st_sh, cat_sh, bg_sh if with_background else None, repl),
        out_shardings=(st_sh, metrics_sh),
        donate_argnums=(0,),
    )


def _metrics_template():
    from catnerf_tpu.train.step import StepMetrics

    z = np.zeros(())
    return StepMetrics(*([z] * len(StepMetrics._fields)))


def shard_state(state: TrainState, mesh: Mesh, n_cls: int) -> TrainState:
    return jax.device_put(state, state_shardings(state, mesh, n_cls))


def shard_batches(cat: CategoryBatch, bg: BackgroundBatch | None, mesh: Mesh):
    cat_sh, bg_sh = batch_shardings(mesh)
    cat = jax.device_put(cat, cat_sh)
    if bg is not None:
        bg = jax.device_put(bg, bg_sh)
    return cat, bg


def init_sharded_session(key, cfg: Config, n_objs_per_cls, mesh: Mesh,
                         with_background: bool = True):
    """Init state directly with the target sharding (params materialise
    sharded; no host round-trip)."""
    state = init_train_state(key, cfg, n_objs_per_cls,
                             with_background=with_background)
    return shard_state(state, mesh, len(n_objs_per_cls))


# ---------------------------------------------------------------------------
# Sharded superstep: the production fast path over a multi-chip mesh.
# The device ray store is sharded over 'model' along the category axis
# (each expert shard holds its categories' rays locally); batch draws use a
# per-category gather that stays shard-local, so the only cross-chip
# traffic per step is the gradient all-reduce over 'data'. The background
# store is replicated (it feeds a replicated background model).
# ---------------------------------------------------------------------------


def store_shardings(mesh: Mesh):
    from catnerf_tpu.data.device_buffer import DeviceRayStore

    ep = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())
    return DeviceRayStore(packed=ep, lengths=repl, bg_packed=repl,
                          bg_length=repl)


def _sample_batch_sharded(store, key, n_per_cls: int, n_bg: int,
                          window: bool = False, want_bg: bool = True):
    """device_buffer.sample_batch with per_category_gather=True, which
    preserves the category-sharded store layout (the flat-index gather of
    the single-chip path would reshape across the sharded axis); the window
    path's vmapped per-category dynamic_slice is shard-local as-is."""
    from catnerf_tpu.data.device_buffer import sample_batch

    return sample_batch(store, key, n_per_cls, n_bg, window=window,
                        per_category_gather=True, want_bg=want_bg)


def make_sharded_superstep(cfg: Config, obj_mask, mesh: Mesh,
                           state_template: TrainState, n_cls: int, store,
                           n_per_cls: int, n_bg: int, n_inner: int,
                           with_background: bool = True,
                           window: bool = False):
    """jitted (state, key) -> (state, last-step metrics): n_inner optimizer
    steps per dispatch, fully sharded. `store` is placed with
    store_shardings before tracing."""
    # A background-less store cannot feed a background-expecting step
    # (tracing inner(state, cat, None) with with_background=True fails at
    # jit time): derive the effective flag from the store.
    with_background = with_background and store.bg_packed is not None
    if window:
        # validate HERE while the store is concrete: once it becomes a jit
        # argument, sample_batch's in-trace check sees a Tracer and no-ops
        from catnerf_tpu.data.device_buffer import check_window_pad

        check_window_pad(store, n_per_cls,
                         n_bg if with_background else None)
    inner = make_train_step(cfg, obj_mask, with_background=with_background,
                            jit=False)
    st_sh = state_shardings(state_template, mesh, n_cls)
    cat_sh, bg_sh = batch_shardings(mesh)
    repl = NamedSharding(mesh, P())
    store_sh = store_shardings(mesh)
    if store.bg_packed is None:
        # mirror the store's None pattern so in_shardings' pytree matches
        store_sh = store_sh._replace(bg_packed=None, bg_length=None)
    store = jax.device_put(store, store_sh)

    # store is a jit ARGUMENT, not a closure: closed-over device arrays are
    # embedded as program constants, pulled device->host at lowering —
    # ruinous for real-scene (GB) stores (see device_buffer.make_superstep).
    def body(store, state, k):
        k_draw, k_step = jax.random.split(k)
        # want_bg tracks the effective flag: a store carrying bg buffers
        # for a background-less step must not pay the per-step bg gather
        # just to discard it
        cat, bg = _sample_batch_sharded(store, k_draw, n_per_cls, n_bg,
                                        window=window,
                                        want_bg=with_background)
        cat = jax.lax.with_sharding_constraint(cat, cat_sh)
        if bg is not None:
            bg = jax.lax.with_sharding_constraint(bg, bg_sh)
        return inner(state, cat, bg, k_step)

    def superstep(state, key, store):
        keys = jax.random.split(key, n_inner)
        state, metrics = jax.lax.scan(
            lambda st, k: body(store, st, k), state, keys)
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    metrics_sh = jax.tree_util.tree_map(lambda _: repl, _metrics_template())
    jitted = jax.jit(superstep, in_shardings=(st_sh, repl, store_sh),
                     out_shardings=(st_sh, metrics_sh), donate_argnums=(0,))

    def run(state, key):
        return jitted(state, key, store)

    # keep AOT inspection working (tests' collective-volume HLO check)
    run.lower = lambda state, key: jitted.lower(state, key, store)
    run.jitted = jitted
    return run
