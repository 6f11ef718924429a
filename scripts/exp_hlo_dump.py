"""Dump the optimized HLO of the production superstep and print the bodies
of named fusions (for attributing per-op trace time to actual computations).

Usage: python scripts/exp_hlo_dump.py fusion.980 fusion.942 copy.607
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step


def main():
    names = sys.argv[1:]
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
                               n_bg=cfg.n_per_optim_bg, n_inner=100,
                               window=True)
    state = jax.tree.map(jnp.copy, sess.state)
    key = jax.random.PRNGKey(0)
    txt = superstep.lower(state, key).compile().as_text()
    lines = txt.splitlines()
    if not names:
        # print all fusion/copy root lines with shapes
        for ln in lines:
            s = ln.strip()
            if s.startswith("%fusion") or s.startswith("%copy") or \
               (" = " in s and ("fusion(" in s or "copy(" in s)):
                print(s[:240])
        return
    for want in names:
        print(f"===== {want} =====")
        # root line
        for ln in lines:
            if f"%{want} " in ln or f"%{want}." in ln or f" {want} = " in ln:
                print(ln.rstrip()[:400])
        # computation body if present
        inside = False
        for ln in lines:
            s = ln.strip()
            if s.startswith(f"%fused_computation") and want in s:
                inside = True
            if inside:
                print(ln.rstrip()[:300])
                if s == "}":
                    inside = False


if __name__ == "__main__":
    main()
