"""Isolate loss-chain cost: fwd and fwd+bwd of step_batch_loss."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from catnerf_tpu.ops import losses

M, R, B = 8, 210, 10
N_INNER = 50
N_DISPATCH = 20


def timed(fn, name):
    @jax.jit
    def scanned(_):
        def body(c, _):
            out = fn()
            s = jax.tree.reduce(lambda a, x: a + x.sum(), out, jnp.zeros(()))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N_INNER)
        return c
    for _ in range(2):
        out = scanned(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        out = scanned(0)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e6
    print(f"{name:46s} {us:9.1f} us", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    alpha = jax.random.normal(ks[0], (M, R, B))
    color = jax.nn.sigmoid(jax.random.normal(ks[1], (M, R, B, 3)))
    gt_depth = jax.random.uniform(ks[2], (M, R), minval=0.5, maxval=3.0)
    gt_color = jax.random.uniform(ks[3], (M, R, 3))
    sem = jax.random.randint(ks[4], (M, R), 0, 3)
    mask_depth = jax.random.uniform(ks[5], (M, R)) > 0.1
    z_vals = jnp.sort(jax.random.uniform(ks[6], (M, R, B), minval=0.2,
                                         maxval=3.5), axis=-1)
    # bg-shaped second call
    alpha_bg = jax.random.normal(ks[7], (1, 1200, 14))
    color_bg = jax.nn.sigmoid(jax.random.normal(ks[0], (1, 1200, 14, 3)))
    gt_depth_bg = jax.random.uniform(ks[1], (1, 1200), minval=0.5, maxval=5.0)
    gt_color_bg = jax.random.uniform(ks[2], (1, 1200, 3))
    sem_bg = jax.random.randint(ks[3], (1, 1200), 0, 3)
    mask_depth_bg = jax.random.uniform(ks[4], (1, 1200)) > 0.1
    z_bg = jnp.sort(jax.random.uniform(ks[5], (1, 1200, 14), minval=0.2,
                                       maxval=5.5), axis=-1)

    def loss_fwd(alpha, color, alpha_bg, color_bg):
        l1 = losses.step_batch_loss(alpha, color, gt_depth, gt_color, sem,
                                    mask_depth, z_vals)
        l2 = losses.step_batch_loss(alpha_bg, color_bg, gt_depth_bg,
                                    gt_color_bg, sem_bg, mask_depth_bg, z_bg)
        return l1.total + l2.total

    timed(lambda: loss_fwd(alpha, color, alpha_bg, color_bg), "loss fwd (cat+bg)")
    g = jax.grad(loss_fwd, argnums=(0, 1, 2, 3))
    timed(lambda: g(alpha, color, alpha_bg, color_bg), "loss fwd+bwd (cat+bg)")


if __name__ == "__main__":
    main()
