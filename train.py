"""Training CLI.

Parity target: the reference driver (`python train.py --config <json>
--logdir <dir>`, ref: train.py:15-251), with working resume (--resume) and a
--synthetic mode that runs the full pipeline on a generated scene (no
dataset required).
"""

from __future__ import annotations

import argparse
import os
import shutil


from catnerf_tpu.loaders import load_scene  # re-export (CLI API compat)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str,
                        default="./configs/Replica/config_replica_room0.json")
    parser.add_argument("--logdir", type=str, default="./logs/Replica/room_0")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on a generated synthetic scene")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in logdir")
    parser.add_argument("--max-iter", type=int, default=None,
                        help="override cfg.max_iter")
    parser.add_argument("--log-iter", type=int, default=None)
    parser.add_argument("--save-iter", type=int, default=None)
    parser.add_argument("--mesh-it", type=int, default=None)
    parser.add_argument("--grid-dim", type=int, default=None,
                        help="override cfg.grid_dim (max marching-cubes res)")
    parser.add_argument("--no-background", action="store_true")
    parser.add_argument("--parity", action="store_true",
                        help="per-step host-staged dispatch (the reference's "
                             "execution shape) instead of the superstep fast "
                             "path")
    parser.add_argument("--strict-parity", action="store_true",
                        help="one-switch head-to-head mode: disables every "
                             "algorithmic improvement over the reference "
                             "(Config.apply_strict_parity, see PARITY.md) "
                             "and implies --parity dispatch")
    parser.add_argument("--trace", action="store_true",
                        help="capture a jax.profiler device trace of the "
                             "first training chunk into <logdir>/trace")
    parser.add_argument("--import-reference-ckpt", type=str, default=None,
                        metavar="DIR",
                        help="load reference-schema per-category .pth "
                             "checkpoints (src/scene_cateogries.py:548-597 "
                             "format) from DIR before training")
    parser.add_argument("--mesh-sharded", action="store_true",
                        help="shard every mesh grid/color evaluation "
                             "data-parallel over ALL visible devices "
                             "(parallel/grid_eval.py; identical output)")
    parser.add_argument("--train-sharded", type=int, nargs="?", const=1,
                        default=None, metavar="N_MODEL",
                        help="shard the fast-path training DP(rays) x "
                             "EP(categories) over all visible devices "
                             "(parallel/sharding.py); optional value = "
                             "'model'-axis width (default 1 = pure DP). "
                             "No-op with one device or under --parity")
    parser.add_argument("--mesh-only", action="store_true",
                        help="skip training: mesh the current (e.g. just "
                             "imported) weights and exit")
    args = parser.parse_args()

    from catnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from catnerf_tpu.mesher.meshing import mesh_scene
    from catnerf_tpu.train import checkpoint as ckpt_mod
    from catnerf_tpu.train.logging import MetricsWriter
    from catnerf_tpu.train.loop import TrainingSession

    os.makedirs(args.logdir, exist_ok=True)

    if args.strict_parity:
        args.parity = True
    cfg, inst_dict, sample_dict, cam = load_scene(
        args.config, args.synthetic, strict_parity=args.strict_parity)
    if not args.synthetic:
        dst = os.path.join(args.logdir, os.path.basename(args.config))
        if not (os.path.exists(dst)
                and os.path.samefile(args.config, dst)):
            shutil.copy(args.config, args.logdir)

    if args.max_iter is not None:
        cfg.max_iter = args.max_iter
    if args.log_iter is not None:
        cfg.log_iter = args.log_iter
    if args.save_iter is not None:
        cfg.save_iter = args.save_iter
    if args.mesh_it is not None:
        cfg.mesh_it = args.mesh_it
    if args.grid_dim is not None:
        cfg.grid_dim = args.grid_dim
        cfg.live_voxel_size = max(cfg.live_voxel_size, 8.0 / args.grid_dim)
    for name in ("log_iter", "save_iter", "mesh_it", "max_iter"):
        if getattr(cfg, name) < 1:
            raise SystemExit(f"{name} must be >= 1 (got {getattr(cfg, name)};"
                             " use a value > max_iter to disable an action)")

    session = TrainingSession(cfg, inst_dict, sample_dict, cam=cam,
                              with_background=not args.no_background)
    writer = MetricsWriter(args.logdir)
    ckpt_dir = os.path.join(args.logdir, "ckpt")

    if args.import_reference_ckpt:
        step = ckpt_mod.import_reference_checkpoints(
            session, args.import_reference_ckpt)
        # adopt the checkpoints' iteration so --mesh-only exports are named
        # iteration_<step>_obj*.obj, where the eval CLIs look for them
        session.iteration = int(step)
        print(f"imported reference checkpoints "
              f"(global_step={step}) from {args.import_reference_ckpt}")

    start = 0
    if args.resume:
        latest = ckpt_mod.latest_checkpoint(ckpt_dir)
        if latest is not None:
            ckpt_mod.restore_session_checkpoint(latest, session)
            start = int(session.state.step)
            session.iteration = start
            print(f"resumed from {latest} at iteration {start}")

    mesh_devices = None
    if args.mesh_sharded:
        import jax

        from catnerf_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh_devices = make_mesh(n_model=1)
            print(f"mesh eval sharded over {mesh_devices.devices.size} devices")
        else:
            print("--mesh-sharded: single device visible, running unsharded")

    # After --resume / --import-reference-ckpt so `--resume --mesh-only`
    # meshes the restored weights, not a fresh initialization.
    mesh_dir = os.path.join(args.logdir, "scene_mesh")
    if args.mesh_only:
        written = mesh_scene(session, mesh_dir, session.iteration,
                             device_mesh=mesh_devices)
        print(f"exported {len(written)} meshes to {mesh_dir}")
        return

    print(f"training {len(session.cls_ids)} categories "
          f"({session.batcher.n_objs_per_cls} instances) "
          f"+ background={session.background is not None}; "
          f"{session.n_per_cls} rays/cat/step")

    # Fast path: one XLA dispatch per log_iter steps (device-resident ray
    # store + lax.scan superstep); --parity keeps the reference's per-step
    # execution shape. All periodic actions land on log_iter multiples.
    fast = (not args.parity and cfg.log_iter > 1
            and cfg.save_iter % cfg.log_iter == 0
            and cfg.mesh_it % cfg.log_iter == 0
            and start % cfg.log_iter == 0)
    if fast:
        train_mesh = None
        if args.train_sharded is not None:
            import jax

            if len(jax.devices()) > 1:
                from catnerf_tpu.parallel.mesh import make_mesh

                train_mesh = make_mesh(n_model=args.train_sharded)
                print(f"training sharded over "
                      f"{dict(train_mesh.shape)} mesh")
            else:
                print("--train-sharded: single device visible, "
                      "running unsharded")
        session.enable_fast_path(n_inner=cfg.log_iter,
                                 device_mesh=train_mesh)
        print(f"fast path: superstep (n_inner={cfg.log_iter})")
    elif args.train_sharded is not None:
        print("--train-sharded requires the fast path (not --parity, and "
              "save/mesh iters multiples of log_iter); running unsharded")

    import math

    from collections import deque

    pending_health = deque()

    def check_health(it, metrics, flush=False):
        """Loss-explosion / NaN detection (the reference calls exit(-1) from
        inside the loss, ref: src/render_rays.py:87-89; here the driver
        detects it, saves a post-mortem checkpoint, and aborts cleanly).

        float(metrics.total) blocks until the device finishes that step, so
        the check runs with two steps of slack — keeping the parity path's
        per-step dispatches asynchronous (a same-step check serializes
        host staging, dispatch, and device execution)."""
        if metrics is not None:
            pending_health.append((it, metrics))
        while len(pending_health) > (0 if flush else 2):
            it0, m0 = pending_health.popleft()
            total = float(m0.total)
            if math.isfinite(total) and total < 1e8:
                continue
            # NB: with the two-step slack, session.state has already
            # absorbed up to two further (possibly NaN-poisoned) updates —
            # label the snapshot with its true iteration and say so.
            it_state = session.iteration
            path = ckpt_mod.save_session_checkpoint(ckpt_dir, session,
                                                    it_state)
            writer.close()
            raise SystemExit(
                f"loss explosion detected at iteration {it0} "
                f"(total={total}); post-mortem state snapshot (iteration "
                f"{it_state}, {it_state - it0} steps past the explosion — "
                f"may be poisoned) saved to {path}")

    def post_step(it, metrics):
        check_health(it, metrics)
        if it % cfg.log_iter == 0:
            writer.log_step(session, metrics, it)
            psnr = float(metrics.cat_psnr.mean())
            bg = (f" bg_psnr={float(metrics.bg_psnr):.2f}"
                  if session.background is not None else "")
            print(f"iter {it}: loss={float(metrics.total):.3f} "
                  f"psnr={psnr:.2f}{bg}")
        if it % cfg.save_iter == 0:
            path = ckpt_mod.save_session_checkpoint(ckpt_dir, session, it)
            print(f"saved checkpoint {path}")
        if it % cfg.mesh_it == 0:
            written = mesh_scene(session, mesh_dir, it,
                                 device_mesh=mesh_devices)
            print(f"exported {len(written)} meshes to {mesh_dir}")

    def maybe_trace(first_chunk_fn):
        if not args.trace:
            return first_chunk_fn()
        import jax

        from catnerf_tpu.utils import device_trace

        with device_trace(os.path.join(args.logdir, "trace")):
            out = first_chunk_fn()
            # honest sync INSIDE the capture: the dispatch is async and on
            # this platform only a device->host pull reliably waits, so
            # stop_trace would otherwise fire before the device executed
            jax.tree_util.tree_map(
                lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape")
                else x, out)
        print(f"device trace written to {args.logdir}/trace")
        return out

    if fast:
        n_chunks = (cfg.max_iter - 1 - start) // cfg.log_iter
        it = start
        for c in range(n_chunks):
            if c == 0:
                metrics = maybe_trace(lambda: session.run_fast(cfg.log_iter))
            else:
                metrics = session.run_fast(cfg.log_iter)
            it += cfg.log_iter
            post_step(it, metrics)
        for j in range(it + 1, cfg.max_iter):
            post_step(j, session.step_once())
    else:
        for it in range(start + 1, cfg.max_iter):
            if it == start + 1:
                metrics = maybe_trace(lambda: session.step_once())
            else:
                metrics = session.step_once()
            post_step(it, metrics)

    check_health(session.iteration, None, flush=True)
    writer.close()


if __name__ == "__main__":
    main()
