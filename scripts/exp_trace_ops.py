"""Per-op time breakdown of the production superstep (warm-trace recipe).

Captures a jax.profiler trace around warmed-up supersteps, parses the
.trace.json.gz for TPU-pid complete events, and aggregates device time by
fusion/op name. 'source' args map fusions back to Python lines.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step

N_INNER = 100
N_DISPATCH = 5


def main():
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    store = build_device_store(sess.categories, sess.background,
                               window_pad=sess.n_per_cls,
                               bg_window_pad=cfg.n_per_optim_bg)
    inner = make_train_step(cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=sess.n_per_cls,
                               n_bg=cfg.n_per_optim_bg, n_inner=N_INNER,
                               window=True)
    state = jax.tree.map(jnp.copy, sess.state)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    float(m.total)

    tdir = tempfile.mkdtemp(prefix="catnerf_trace_")
    jax.profiler.start_trace(tdir)
    for _ in range(N_DISPATCH):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    float(m.total)
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", tdir)
        sys.exit(1)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device:" in pname.upper():
                tpu_pids.add(e["pid"])
    # fall back: pids that own XLA op events
    if not tpu_pids:
        for e in events:
            if e.get("ph") == "X" and "args" in e and "run_id" in str(e["args"]):
                tpu_pids.add(e["pid"])

    import re

    def is_container(name):
        # jit_* / while.N / bare-number step markers nest the leaf ops and
        # would double-count them.
        return (name.startswith("jit_") or re.fullmatch(r"while\.\d+", name)
                or re.fullmatch(r"\d+", name))

    by_op = defaultdict(float)
    by_src = defaultdict(float)
    src_of = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        if is_container(name):
            continue
        dur = e.get("dur", 0)
        by_op[name] += dur
        total += dur
        s = e.get("args", {}).get("source", "")
        by_src[s or "<no source>"] += dur
        if s and name not in src_of:
            src_of[name] = s
    steps = N_DISPATCH * N_INNER
    print(f"TPU pids {sorted(tpu_pids)}, leaf device-op time "
          f"{total/1e3:.2f} ms over {steps} steps "
          f"({total/steps:.1f} us/step)")
    print("--- by source line ---")
    for s, us in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{us/steps:8.2f} us/step  {s[-70:]}")
    print("--- top individual ops ---")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        src = src_of.get(name, "")
        if len(src) > 60:
            src = "..." + src[-57:]
        print(f"{us/steps:8.2f} us/step  {name[:70]:70s} {src}")


if __name__ == "__main__":
    main()
