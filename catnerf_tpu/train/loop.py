"""Training session driver.

Replaces the reference's flat training loop (ref: train.py:15-243): builds
per-category ray buffers, the stacked train state, and runs the jitted step.
Checkpointing/meshing/logging hook in via the driver methods.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from catnerf_tpu.config import Config
from catnerf_tpu.data.camera import CameraInfo
from catnerf_tpu.data.scene import CategoryScene, SceneBatcher
from catnerf_tpu.models import codes as codes_mod
from catnerf_tpu.train import packing
from catnerf_tpu.train.state import TrainState, init_train_state
from catnerf_tpu.train.step import StepMetrics, make_train_step
from catnerf_tpu.utils import phase_timer


class TrainingSession:
    def __init__(self, cfg: Config, inst_dict: dict, sample_dict: dict,
                 cam: CameraInfo | None = None, with_background: bool = True):
        self.cfg = cfg
        cam = cam if cam is not None else CameraInfo.from_config(cfg)
        self.cam = cam
        # kept for mesh-time space carving (cfg.mesh_space_carving)
        self.sample_dict = sample_dict

        cls_ids = sorted(k for k in inst_dict.keys() if k != 0)
        assert len(cls_ids) <= cfg.max_n_models, (
            f"{len(cls_ids)} categories exceeds max_n_models={cfg.max_n_models}"
        )
        self.categories = [
            CategoryScene(cfg, cid, inst_dict[cid], sample_dict, cam)
            for cid in cls_ids
        ]
        self.cls_ids = cls_ids
        self.background = (
            CategoryScene(cfg, 0, inst_dict[0], sample_dict, cam)
            if with_background and 0 in inst_dict else None
        )
        self.batcher = SceneBatcher(self.categories, self.background)

        n_objs = self.batcher.n_objs_per_cls
        self.obj_mask = codes_mod.obj_validity_mask(n_objs)
        key = jax.random.PRNGKey(cfg.seed)
        self.base_key, init_key = jax.random.split(key)
        with phase_timer("session", "state_init"):
            self.state: TrainState = init_train_state(
                init_key, cfg, n_objs,
                with_background=self.background is not None
            )
        self.n_per_cls = self.batcher.rays_per_category(cfg.n_per_optim)
        self._pack_spec = packing.make_spec(
            len(self.cls_ids), self.n_per_cls, cfg.n_per_optim_bg,
            with_background=self.background is not None,
        )
        self.install_step(make_train_step(
            cfg, self.obj_mask, with_background=self.background is not None,
            jit=False,
        ))
        # instances written in post-training by fit.adopt_instance, in
        # adoption order; persisted as a checkpoint sidecar so they survive
        # a restart (train/checkpoint.py::save/restore_session_checkpoint)
        self.adopted_instances: list[dict] = []
        self.iteration = 0
        self._superstep = None
        self._n_inner = 0
        self._device_mesh = None
        self._prefetch_pool = None
        self._prefetch_fut = None

    # ------------------------------------------------------------------
    # The session's train step is kept in BOTH unjitted and jitted forms:
    # step_once runs it through a packed-staging wrapper (one fused H2D
    # transfer per step, train/packing.py) that re-traces the unjitted
    # body inside its own jit; external callers (bench.py) use .step_fn.
    def install_step(self, step_nojit) -> None:
        """Install the session's train step from its UNJITTED form."""
        self._step_fn_nojit = step_nojit
        self._step_fn = jax.jit(step_nojit, donate_argnums=(0,))
        self._packed_step = None

    @property
    def step_fn(self):
        return self._step_fn

    def _staged_batch(self):
        """Assemble the next host batch and ship it as ONE device buffer.

        The reference stages ~11 tensors per iteration (ref:
        train.py:98-134); over the axon tunnel each transfer costs fixed
        latency, so all fields are packed into a single f32 buffer
        host-side and unpacked with static slices in-graph."""
        cat_np, bg_np = self.batcher.next_batch(
            self.n_per_cls, self.cfg.n_per_optim_bg
        )
        return jax.device_put(packing.pack(self._pack_spec, cat_np, bg_np))

    def _build_packed_step(self):
        inner = self._step_fn_nojit
        spec = self._pack_spec

        def packed(state, flat, key):
            cat, bg = packing.unpack(spec, flat)
            return inner(state, cat, bg, key)

        # flat is NOT donated: no output aliases its shape, so donation
        # would only emit "donated buffer not usable" warnings
        return jax.jit(packed, donate_argnums=(0,))

    def step_once(self) -> StepMetrics:
        """One host-staged optimizer step (the reference's per-iteration
        shape, ref: train.py:98-201). Host batch assembly for step i+1 is
        pipelined on a worker thread while the device runs step i — batch
        ORDER (and therefore the epoch-cursor sampling semantics) is
        unchanged, only the staging overlaps."""
        if self._prefetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._prefetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="batch-prefetch")
        fut, self._prefetch_fut = self._prefetch_fut, None
        flat = fut.result() if fut is not None else self._staged_batch()
        self._prefetch_fut = self._prefetch_pool.submit(self._staged_batch)
        if self._packed_step is None:
            self._packed_step = self._build_packed_step()
        self.state, metrics = self._packed_step(self.state, flat, self.base_key)
        self.iteration += 1
        return metrics

    def release_prefetch(self) -> None:
        """Drop the one-step-ahead prefetched batch. step_once always
        leaves one assembled, device-uploaded batch pinned in the future;
        after the last step of a run that batch (and its device memory)
        would otherwise live for the session's remaining lifetime
        (meshing, eval, serving)."""
        fut, self._prefetch_fut = self._prefetch_fut, None
        if fut is not None:
            fut.result()  # let the worker finish; drop the arrays

    def run(self, n_iters: int,
            callback: Callable[[int, StepMetrics], None] | None = None,
            callback_every: int = 100) -> list[dict[str, Any]]:
        history = []
        # self.iteration is absolute (resume keeps counting); the final
        # history append must key off the RUN's end, not n_iters
        end_iter = self.iteration + n_iters
        for _ in range(n_iters):
            metrics = self.step_once()
            # the callback and the history must see the SAME iterations —
            # including the run's final one when n_iters is not a multiple
            # of callback_every
            at_mark = (self.iteration % callback_every == 0
                       or self.iteration == end_iter)
            if callback is not None and at_mark:
                callback(self.iteration, metrics)
            if at_mark:
                history.append(self.metrics_to_dict(metrics))
        self.release_prefetch()
        return history

    # ------------------------------------------------------------------
    # Production fast path: device-resident ray store + multi-step
    # superstep (one dispatch per `n_inner` optimizer steps). Statistically
    # equivalent to the parity path: each step takes a random cyclic window
    # of the build-time-shuffled buffers (the reference's cursor is likewise
    # a sequential window over a shuffled buffer) instead of the host
    # epoch-shuffle cursor.
    def enable_fast_path(self, n_inner: int, device_mesh=None) -> None:
        """Device-resident ray store + superstep. With `device_mesh` (a
        ('data','model') jax.sharding.Mesh of >1 device), the store, state,
        optimizer moments, and every inner step are sharded DP(rays) x
        EP(categories) over the mesh — the session's state is re-placed
        sharded and all subsequent run_fast dispatches execute multi-chip
        (the only cross-chip traffic is the gradient all-reduce over
        'data'; tests/test_parallel.py::test_weak_scaling_collective_volume)."""
        from catnerf_tpu.data.device_buffer import (
            build_device_store, make_superstep)

        # remembered so a fast-path REBUILD (fit.adopt_instance after a code
        # adoption changes param shapes) restores the same mesh placement
        self._device_mesh = device_mesh
        store = build_device_store(
            self.categories, self.background,
            window_pad=self.n_per_cls,
            bg_window_pad=self.cfg.n_per_optim_bg)
        self._store = store  # introspectable (scripts/stress_scale.py)
        if device_mesh is not None and device_mesh.devices.size > 1:
            from catnerf_tpu.parallel import sharding
            from catnerf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            n_cls = len(self.cls_ids)
            n_model = device_mesh.shape[MODEL_AXIS]
            n_data = device_mesh.shape[DATA_AXIS]
            if n_cls % n_model:
                raise ValueError(
                    f"{n_cls} categories not divisible over the mesh's "
                    f"{n_model}-way 'model' axis; use make_mesh(n_model=d) "
                    f"with d | {n_cls}")
            if self.n_per_cls % n_data or self.cfg.n_per_optim_bg % n_data:
                raise ValueError(
                    f"ray batch ({self.n_per_cls}/cat, "
                    f"{self.cfg.n_per_optim_bg} bg) not divisible over the "
                    f"{n_data}-way 'data' axis")
            self.state = sharding.shard_state(self.state, device_mesh, n_cls)
            self._superstep = sharding.make_sharded_superstep(
                self.cfg, self.obj_mask, device_mesh, self.state, n_cls,
                store, n_per_cls=self.n_per_cls,
                n_bg=self.cfg.n_per_optim_bg, n_inner=n_inner, window=True)
        else:
            with phase_timer("fast_path", "superstep_build"):
                inner = make_train_step(
                    self.cfg, self.obj_mask,
                    with_background=self.background is not None, jit=False)
                self._superstep = make_superstep(
                    inner, store, n_per_cls=self.n_per_cls,
                    n_bg=self.cfg.n_per_optim_bg, n_inner=n_inner,
                    window=True)
        self._n_inner = n_inner

    def run_fast(self, n_steps: int) -> StepMetrics:
        """Advance `n_steps` iterations via supersteps (must be enabled and
        n_steps a multiple of n_inner). Returns the last step's metrics."""
        assert self._superstep is not None, "call enable_fast_path() first"
        assert n_steps % self._n_inner == 0
        metrics = None
        for _ in range(n_steps // self._n_inner):
            self.base_key, k = jax.random.split(self.base_key)
            self.state, metrics = self._superstep(self.state, k)
            self.iteration += self._n_inner
        return metrics

    def metrics_to_dict(self, m: StepMetrics) -> dict[str, Any]:
        d = {
            "iteration": self.iteration,
            "total": float(m.total),
        }
        if self.background is not None:
            # bg metrics are hard-zero without a background model, which
            # makes the L1-PSNR proxy +inf — invalid in strict JSON
            d["bg_psnr"] = float(m.bg_psnr)
        for i, cid in enumerate(self.cls_ids):
            d[f"cls_{cid}/depth"] = float(m.cat_depth[i])
            d[f"cls_{cid}/color"] = float(m.cat_color[i])
            d[f"cls_{cid}/opacity"] = float(m.cat_opacity[i])
            d[f"cls_{cid}/psnr"] = float(m.cat_psnr[i])
        if self.background is not None:
            d["background/depth"] = float(m.bg_depth)
            d["background/color"] = float(m.bg_color)
            d["background/opacity"] = float(m.bg_opacity)
        return d

    # ------------------------------------------------------------------
    def category_params(self, cls_id: int) -> dict:
        """Per-category parameter slices (PE, FC, codes) for meshing/eval."""
        i = self.cls_ids.index(cls_id)
        p = self.state.params
        return {
            "pe": jax.tree_util.tree_map(lambda x: x[i], p["cat_pe"]),
            "fc": jax.tree_util.tree_map(lambda x: x[i], p["cat_fc"]),
            "shape_codes": p["codes"]["shape"][i],
            "texture_codes": p["codes"]["texture"][i],
        }

    def background_params(self) -> dict | None:
        if self.background is None:
            return None
        return {"pe": self.state.params["bg_pe"], "fc": self.state.params["bg_fc"]}
