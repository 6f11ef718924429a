"""Pallas TPU mega-kernels: fused PE + field-MLP forward/backward.

Why: the training step is op-count-bound, not FLOP-bound — the XLA graph of
~40 tiny matmuls/elementwise ops per forward (and ~80 in backward) costs
~5-10 us of fixed overhead per op at these shapes (W=32 MLPs, a few thousand
points). Fusing the entire positional-encoding + MLP chain into one Pallas
kernel (and its hand-derived backward into another) collapses those into two
kernels whose intermediates never leave VMEM.

Covers the two field architectures (ref: src/model.py:22-155):
  * CodeNeRF category ensemble — specialised for the shipped hyperparams
    shape_blocks=2, texture_blocks=1, do_cat=True (every reference config,
    configs/*/*.json `net_hyperparams`). The per-ray latent-code projections
    (latent_dim wide, per ray not per point) stay in XLA; the kernel takes
    the four pre-broadcast 32-wide injection vectors.
  * OccupancyMap background — hidden=128, hidden_layers_block=1.

Numerics are float32 end-to-end and match the pure-XLA modules
(catnerf_tpu/models/{codenerf,occupancy}.py) to ~1e-5; those modules remain
the reference implementation and CPU fallback.

Kernel layout: batch-major [rows, features] tiles; rows = flattened
ray-sample points (grid over category x row-tiles), features padded to lanes
by Mosaic. Weight/bias gradients accumulate across the row-tile grid axis
into per-category output blocks (revisited-block reduction; the tile axis is
the fastest-varying grid dimension, so accumulation is sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N_FREQS = 6  # 2^0..2^5 (DEFAULT_MAX_DEG = 5)
_PI = 3.14159265358979323846


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, target: int = 512) -> int:
    """Row-tile size: ceil-divide n into ~target-row tiles, rounded up to 8."""
    n_tiles = max(1, -(-n // target))
    t = -(-n // n_tiles)
    return -(-t // 8) * 8


def _pad_rows(x: jnp.ndarray, n_pad: int, axis: int = 1) -> jnp.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n_pad - x.shape[axis])
    return jnp.pad(x, pad) if n_pad != x.shape[axis] else x


# ---------------------------------------------------------------------------
# Shared in-kernel forward chains
# ---------------------------------------------------------------------------


def _embed(pts, B, inv_scale):
    """PE chain: pts [T,3] -> (t [T,3], proj [T,21], emb1 [T,87], emb2 [T,42]).

    B is stored [21, 3] as in the reference module (proj = t @ B.T)."""
    t = pts * inv_scale
    proj = jax.lax.dot_general(t, B, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [T, 21]
    sins = [jnp.sin((_PI * (2.0 ** f)) * proj) for f in range(_N_FREQS)]
    emb1 = jnp.concatenate([t] + sins[:4], axis=1)   # [T, 87]
    emb2 = jnp.concatenate(sins[4:], axis=1)         # [T, 42]
    return t, proj, emb1, emb2


def _mm(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _codenerf_chain(emb1, emb2, zs0, zc, zs1, zt0, W, b):
    """Forward chain (ref: src/model.py:56-84). W/b: dicts of 2D weights.

    Returns (sigma [T,1], color [T,3], intermediates for backward)."""
    a0 = _mm(emb1, W["e"]) + b["e"]
    r0 = jnp.maximum(a0, 0.0)
    g0 = r0 + zs0
    a1 = _mm(g0, W["s0"]) + b["s0"]
    r1 = jnp.maximum(a1, 0.0)
    g1 = r1 + zc
    a2 = _mm(g1, W["c"][:32]) + _mm(emb1, W["c"][32:]) + b["c"]
    r2 = jnp.maximum(a2, 0.0)
    g2 = r2 + zs1
    a3 = _mm(g2, W["s1"]) + b["s1"]
    r3 = jnp.maximum(a3, 0.0)
    h = _mm(r3, W["en"]) + b["en"]
    sg = (_mm(h, W["sg"]) + b["sg"]) * 10.0
    a4 = _mm(h, W["vd"][:32]) + _mm(emb2, W["vd"][32:]) + b["vd"]
    r4 = jnp.maximum(a4, 0.0)
    g4 = r4 + zt0
    a5 = _mm(g4, W["t0"]) + b["t0"]
    r5 = jnp.maximum(a5, 0.0)
    a6 = _mm(r5, W["r0"]) + b["r0"]
    r6 = jnp.maximum(a6, 0.0)
    a7 = _mm(r6, W["r1"]) + b["r1"]
    color = jax.nn.sigmoid(a7)
    inter = dict(a0=a0, r0=r0, g0=g0, a1=a1, g1=g1, a2=a2, g2=g2, a3=a3,
                 r3=r3, h=h, a4=a4, g4=g4, a5=a5, r5=r5, a6=a6, r6=r6,
                 color=color, emb1=emb1, emb2=emb2)
    return sg, color, inter


_CN_WKEYS = ("e", "s0", "c", "s1", "en", "sg", "vd", "t0", "r0", "r1")


def _read_cn_params(refs):
    """refs: iterator of kernel refs in (B, W..., b...) order."""
    B = next(refs)[0]
    W = {k: next(refs)[0] for k in _CN_WKEYS}
    b = {k: next(refs)[:].reshape(1, -1) for k in _CN_WKEYS}
    return B, W, b


def _codenerf_fwd_kernel(inv_scale, *refs):
    refs = iter(refs)
    pts = next(refs)[0]
    zs0, zc, zs1, zt0 = (next(refs)[0] for _ in range(4))
    B, W, b = _read_cn_params(refs)
    out_ref = next(refs)
    t, proj, emb1, emb2 = _embed(pts, B, inv_scale)
    sg, color, _ = _codenerf_chain(emb1, emb2, zs0, zc, zs1, zt0, W, b)
    out_ref[0] = jnp.concatenate([sg, color], axis=1)  # [T, 4]


def _codenerf_bwd_kernel(inv_scale, *refs):
    refs = iter(refs)
    pts = next(refs)[0]
    zs0, zc, zs1, zt0 = (next(refs)[0] for _ in range(4))
    B, W, b = _read_cn_params(refs)
    dout = next(refs)[0]  # [T, 4]

    # outputs
    dpts_ref = next(refs)
    dz_refs = [next(refs) for _ in range(4)]
    dB_ref = next(refs)
    dW_refs = {k: next(refs) for k in _CN_WKEYS}
    db_refs = {k: next(refs) for k in _CN_WKEYS}

    # recompute forward
    t, proj, emb1, emb2 = _embed(pts, B, inv_scale)
    _, _, iv = _codenerf_chain(emb1, emb2, zs0, zc, zs1, zt0, W, b)

    dsg = dout[:, 0:1] * 10.0
    dcol = dout[:, 1:4]

    dW = {}
    db = {}

    def mmT_acc(x, d):  # x^T @ d  -> [in, out]
        return jax.lax.dot_general(x, d, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_T(d, w):  # d @ w^T
        return jax.lax.dot_general(d, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    da7 = dcol * iv["color"] * (1.0 - iv["color"])
    dW["r1"] = mmT_acc(iv["r6"], da7)
    db["r1"] = jnp.sum(da7, axis=0, keepdims=True)
    da6 = mm_T(da7, W["r1"]) * (iv["a6"] > 0)
    dW["r0"] = mmT_acc(iv["r5"], da6)
    db["r0"] = jnp.sum(da6, axis=0, keepdims=True)
    da5 = mm_T(da6, W["r0"]) * (iv["a5"] > 0)
    dW["t0"] = mmT_acc(iv["g4"], da5)
    db["t0"] = jnp.sum(da5, axis=0, keepdims=True)
    dg4 = mm_T(da5, W["t0"])
    da4 = dg4 * (iv["a4"] > 0)
    dW["vd"] = jnp.concatenate(
        [mmT_acc(iv["h"], da4), mmT_acc(emb2, da4)], axis=0)
    db["vd"] = jnp.sum(da4, axis=0, keepdims=True)
    dh = mm_T(da4, W["vd"][:32])
    demb2 = mm_T(da4, W["vd"][32:])
    dW["sg"] = mmT_acc(iv["h"], dsg)
    db["sg"] = jnp.sum(dsg, axis=0, keepdims=True)
    dh = dh + mm_T(dsg, W["sg"])
    dW["en"] = mmT_acc(iv["r3"], dh)
    db["en"] = jnp.sum(dh, axis=0, keepdims=True)
    da3 = mm_T(dh, W["en"]) * (iv["a3"] > 0)
    dW["s1"] = mmT_acc(iv["g2"], da3)
    db["s1"] = jnp.sum(da3, axis=0, keepdims=True)
    dg2 = mm_T(da3, W["s1"])
    da2 = dg2 * (iv["a2"] > 0)
    dW["c"] = jnp.concatenate(
        [mmT_acc(iv["g1"], da2), mmT_acc(emb1, da2)], axis=0)
    db["c"] = jnp.sum(da2, axis=0, keepdims=True)
    dg1 = mm_T(da2, W["c"][:32])
    demb1 = mm_T(da2, W["c"][32:])
    da1 = dg1 * (iv["a1"] > 0)
    dW["s0"] = mmT_acc(iv["g0"], da1)
    db["s0"] = jnp.sum(da1, axis=0, keepdims=True)
    dg0 = mm_T(da1, W["s0"])
    da0 = dg0 * (iv["a0"] > 0)
    dW["e"] = mmT_acc(emb1, da0)
    db["e"] = jnp.sum(da0, axis=0, keepdims=True)
    demb1 = demb1 + mm_T(da0, W["e"])

    # embedding backward: emb1 = [t, s0..s3], emb2 = [s4, s5]
    dt = demb1[:, :3]
    dproj = jnp.zeros_like(proj)
    for f in range(4):
        ds = demb1[:, 3 + 21 * f: 3 + 21 * (f + 1)]
        w = _PI * (2.0 ** f)
        dproj = dproj + ds * (w * jnp.cos(w * proj))
    for f in range(4, 6):
        ds = demb2[:, 21 * (f - 4): 21 * (f - 3)]
        w = _PI * (2.0 ** f)
        dproj = dproj + ds * (w * jnp.cos(w * proj))
    dB = mmT_acc(dproj, t)  # [21, 3]
    dt = dt + _mm(dproj, B)
    dpts = dt * inv_scale

    # per-point outputs
    dpts_ref[0] = dpts
    for ref, val in zip(dz_refs, (dg0, dg1, dg2, dg4)):
        ref[0] = val

    # accumulated outputs (tile axis is the last, sequential, grid dim)
    is_first = pl.program_id(1) == 0

    @pl.when(is_first)
    def _():
        dB_ref[0] = dB
        for k in _CN_WKEYS:
            dW_refs[k][0] = dW[k]
            db_refs[k][:] = db[k].reshape(db_refs[k].shape)

    @pl.when(jnp.logical_not(is_first))
    def _():
        dB_ref[0] += dB
        for k in _CN_WKEYS:
            dW_refs[k][0] += dW[k]
            db_refs[k][:] += db[k].reshape(db_refs[k].shape)


def _cn_param_arrays(fc):
    """Stacked [C, ...] weight/bias arrays from the cat_fc pytree, kernel
    order. Biases are reshaped [C, out] -> [C, 1, out] so their (1, out)
    blocks satisfy the Mosaic block-shape rule (last two dims must divide
    (8, 128) or equal the array dims)."""
    Ws = {
        "e": fc["encoding_xyz"], "s0": fc["shape_layers"][0],
        "c": fc["cat_layer"], "s1": fc["shape_layers"][1],
        "en": fc["encoding_shape"], "sg": fc["sigma"],
        "vd": fc["encoding_viewdir"], "t0": fc["texture_layers"][0],
        "r0": fc["rgb_0"], "r1": fc["rgb_1"],
    }
    return ([Ws[k]["w"] for k in _CN_WKEYS],
            [Ws[k]["b"][:, None, :] for k in _CN_WKEYS])


def _cn_rebuild_grads(fc_like, dWs, dbs, dB):
    """Grad pytree matching the cat_fc structure; latent layers get zeros
    (their grads flow through the XLA-side z projections)."""
    g = jax.tree.map(jnp.zeros_like, fc_like)
    name = {
        "e": ("encoding_xyz",), "s0": ("shape_layers", 0),
        "c": ("cat_layer",), "s1": ("shape_layers", 1),
        "en": ("encoding_shape",), "sg": ("sigma",),
        "vd": ("encoding_viewdir",), "t0": ("texture_layers", 0),
        "r0": ("rgb_0",), "r1": ("rgb_1",),
    }
    for i, k in enumerate(_CN_WKEYS):
        path = name[k]
        node = g
        for p in path[:-1] if len(path) > 1 else []:
            node = node[p]
        leaf = node[path[-1]]
        leaf["w"] = dWs[i]
        leaf["b"] = dbs[i].reshape(leaf["b"].shape)
    return g, dB


@functools.lru_cache(maxsize=None)
def _make_codenerf_fused(scale: float, interpret: bool):
    inv_scale = 1.0 / scale

    def fwd_call(fc, peB, pts, zs0, zc, zs1, zt0):
        C, N, _ = pts.shape
        T = _pick_tile(N)
        Np = -(-N // T) * T
        nt = Np // T
        pts_p = _pad_rows(pts, Np)
        zs = [_pad_rows(z, Np) for z in (zs0, zc, zs1, zt0)]
        Wl, bl = _cn_param_arrays(fc)

        row_spec3 = pl.BlockSpec((1, T, 3), lambda c, t: (c, t, 0),
                                 memory_space=pltpu.VMEM)
        row_spec32 = pl.BlockSpec((1, T, 32), lambda c, t: (c, t, 0),
                                  memory_space=pltpu.VMEM)

        def par_spec(a):
            return pl.BlockSpec((1,) + a.shape[1:], lambda c, t: (c,) + (0,) * (a.ndim - 1),
                                memory_space=pltpu.VMEM)

        in_specs = ([row_spec3] + [row_spec32] * 4 +
                    [par_spec(peB)] + [par_spec(w) for w in Wl] +
                    [par_spec(b) for b in bl])
        out_spec = pl.BlockSpec((1, T, 4), lambda c, t: (c, t, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_codenerf_fwd_kernel, inv_scale),
            grid=(C, nt),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((C, Np, 4), jnp.float32),
            interpret=interpret,
        )(pts_p, *zs, peB, *Wl, *bl)
        return out[:, :N, 0], out[:, :N, 1:4]

    @jax.custom_vjp
    def f(fc, peB, pts, zs0, zc, zs1, zt0):
        return fwd_call(fc, peB, pts, zs0, zc, zs1, zt0)

    def f_fwd(fc, peB, pts, zs0, zc, zs1, zt0):
        out = fwd_call(fc, peB, pts, zs0, zc, zs1, zt0)
        return out, (fc, peB, pts, zs0, zc, zs1, zt0)

    def f_bwd(res, cot):
        fc, peB, pts, zs0, zc, zs1, zt0 = res
        dsigma, drgb = cot
        C, N, _ = pts.shape
        T = _pick_tile(N)
        Np = -(-N // T) * T
        nt = Np // T
        dout = jnp.concatenate([dsigma[..., None], drgb], axis=-1)
        dout = _pad_rows(dout, Np)
        pts_p = _pad_rows(pts, Np)
        zs = [_pad_rows(z, Np) for z in (zs0, zc, zs1, zt0)]
        Wl, bl = _cn_param_arrays(fc)

        row_spec3 = pl.BlockSpec((1, T, 3), lambda c, t: (c, t, 0),
                                 memory_space=pltpu.VMEM)
        row_spec32 = pl.BlockSpec((1, T, 32), lambda c, t: (c, t, 0),
                                  memory_space=pltpu.VMEM)
        row_spec4 = pl.BlockSpec((1, T, 4), lambda c, t: (c, t, 0),
                                 memory_space=pltpu.VMEM)

        def par_spec(a):
            return pl.BlockSpec((1,) + a.shape[1:], lambda c, t: (c,) + (0,) * (a.ndim - 1),
                                memory_space=pltpu.VMEM)

        in_specs = ([row_spec3] + [row_spec32] * 4 +
                    [par_spec(peB)] + [par_spec(w) for w in Wl] +
                    [par_spec(b) for b in bl] + [row_spec4])
        out_specs = ([row_spec3] + [row_spec32] * 4 + [par_spec(peB)] +
                     [par_spec(w) for w in Wl] + [par_spec(b) for b in bl])
        out_shapes = (
            [jax.ShapeDtypeStruct((C, Np, 3), jnp.float32)] +
            [jax.ShapeDtypeStruct((C, Np, 32), jnp.float32)] * 4 +
            [jax.ShapeDtypeStruct(peB.shape, jnp.float32)] +
            [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in Wl] +
            [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bl])
        outs = pl.pallas_call(
            functools.partial(_codenerf_bwd_kernel, inv_scale),
            grid=(C, nt),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(pts_p, *zs, peB, *Wl, *bl, dout)

        dpts = outs[0][:, :N]
        dzs = [o[:, :N] for o in outs[1:5]]
        dB = outs[5]
        dWs = outs[6:16]
        dbs = outs[16:26]
        dfc, dB_ = _cn_rebuild_grads(fc, dWs, dbs, dB)
        return (dfc, dB_, dpts, *dzs)

    f.defvjp(f_fwd, f_bwd)
    return f


def codenerf_fused_apply(fc: dict, pe: dict, pts: jnp.ndarray,
                         zs0: jnp.ndarray, zc: jnp.ndarray, zs1: jnp.ndarray,
                         zt0: jnp.ndarray, *, scale: float,
                         interpret: bool | None = None):
    """Fused category-ensemble forward.

    fc: stacked cat_fc params pytree ([C, ...] leaves); pe: {"B": [C, 21, 3]}
    (the stacked embedding.init_params layout);
    pts: [C, N, 3] object-frame sample points; zs0/zc/zs1/zt0: [C, N, 32]
    pre-broadcast ReLU'd latent injections. Returns (sigma [C, N], rgb
    [C, N, 3]); differentiable w.r.t. everything (PE basis included).
    """
    if interpret is None:
        interpret = _auto_interpret()
    return _make_codenerf_fused(float(scale), bool(interpret))(
        fc, pe["B"], pts, zs0, zc, zs1, zt0)


# ---------------------------------------------------------------------------
# Background OccupancyMap kernel (hidden=128, hidden_layers_block=1)
# ---------------------------------------------------------------------------

_OC_WKEYS = ("in", "m1", "c", "m2", "oa", "cl", "oc")


def _occ_chain(emb1, emb2, W, b, hidden):
    a0 = _mm(emb1, W["in"]) + b["in"]
    r0 = jnp.maximum(a0, 0.0)
    a1 = _mm(r0, W["m1"]) + b["m1"]
    r1 = jnp.maximum(a1, 0.0)
    a2 = _mm(r1, W["c"][:hidden]) + _mm(emb1, W["c"][hidden:]) + b["c"]
    r2 = jnp.maximum(a2, 0.0)
    a3 = _mm(r2, W["m2"]) + b["m2"]
    r3 = jnp.maximum(a3, 0.0)
    alpha = (_mm(r3, W["oa"]) + b["oa"]) * 10.0
    a4 = _mm(r3, W["cl"][:hidden]) + _mm(emb2, W["cl"][hidden:]) + b["cl"]
    r4 = jnp.maximum(a4, 0.0)
    a5 = _mm(r4, W["oc"]) + b["oc"]
    color = jax.nn.sigmoid(a5)
    iv = dict(a0=a0, r0=r0, a1=a1, r1=r1, a2=a2, r2=r2, a3=a3, r3=r3,
              a4=a4, r4=r4, color=color)
    return alpha, color, iv


def _read_oc_params(refs):
    B = next(refs)[:]
    W = {k: next(refs)[:] for k in _OC_WKEYS}
    b = {k: next(refs)[:].reshape(1, -1) for k in _OC_WKEYS}
    return B, W, b


def _occ_fwd_kernel(inv_scale, hidden, *refs):
    refs = iter(refs)
    pts = next(refs)[:]
    B, W, b = _read_oc_params(refs)
    out_ref = next(refs)
    t, proj, emb1, emb2 = _embed(pts, B, inv_scale)
    alpha, color, _ = _occ_chain(emb1, emb2, W, b, hidden)
    out_ref[:] = jnp.concatenate([alpha, color], axis=1)


def _occ_bwd_kernel(inv_scale, hidden, *refs):
    refs = iter(refs)
    pts = next(refs)[:]
    B, W, b = _read_oc_params(refs)
    dout = next(refs)[:]
    dpts_ref = next(refs)
    dB_ref = next(refs)
    dW_refs = {k: next(refs) for k in _OC_WKEYS}
    db_refs = {k: next(refs) for k in _OC_WKEYS}

    t, proj, emb1, emb2 = _embed(pts, B, inv_scale)
    _, _, iv = _occ_chain(emb1, emb2, W, b, hidden)
    dalpha = dout[:, 0:1] * 10.0
    dcol = dout[:, 1:4]

    def mmT_acc(x, d):
        return jax.lax.dot_general(x, d, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_T(d, w):
        return jax.lax.dot_general(d, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dW = {}
    db = {}
    da5 = dcol * iv["color"] * (1.0 - iv["color"])
    dW["oc"] = mmT_acc(iv["r4"], da5)
    db["oc"] = jnp.sum(da5, axis=0, keepdims=True)
    da4 = mm_T(da5, W["oc"]) * (iv["a4"] > 0)
    dW["cl"] = jnp.concatenate(
        [mmT_acc(iv["r3"], da4), mmT_acc(emb2, da4)], axis=0)
    db["cl"] = jnp.sum(da4, axis=0, keepdims=True)
    dr3 = mm_T(da4, W["cl"][:hidden])
    demb2 = mm_T(da4, W["cl"][hidden:])
    dW["oa"] = mmT_acc(iv["r3"], dalpha)
    db["oa"] = jnp.sum(dalpha, axis=0, keepdims=True)
    dr3 = dr3 + mm_T(dalpha, W["oa"])
    da3 = dr3 * (iv["a3"] > 0)
    dW["m2"] = mmT_acc(iv["r2"], da3)
    db["m2"] = jnp.sum(da3, axis=0, keepdims=True)
    da2 = mm_T(da3, W["m2"]) * (iv["a2"] > 0)
    dW["c"] = jnp.concatenate(
        [mmT_acc(iv["r1"], da2), mmT_acc(emb1, da2)], axis=0)
    db["c"] = jnp.sum(da2, axis=0, keepdims=True)
    dr1 = mm_T(da2, W["c"][:hidden])
    demb1 = mm_T(da2, W["c"][hidden:])
    da1 = dr1 * (iv["a1"] > 0)
    dW["m1"] = mmT_acc(iv["r0"], da1)
    db["m1"] = jnp.sum(da1, axis=0, keepdims=True)
    da0 = mm_T(da1, W["m1"]) * (iv["a0"] > 0)
    dW["in"] = mmT_acc(emb1, da0)
    db["in"] = jnp.sum(da0, axis=0, keepdims=True)
    demb1 = demb1 + mm_T(da0, W["in"])

    dt = demb1[:, :3]
    dproj = jnp.zeros_like(proj)
    for f in range(4):
        ds = demb1[:, 3 + 21 * f: 3 + 21 * (f + 1)]
        w = _PI * (2.0 ** f)
        dproj = dproj + ds * (w * jnp.cos(w * proj))
    for f in range(4, 6):
        ds = demb2[:, 21 * (f - 4): 21 * (f - 3)]
        w = _PI * (2.0 ** f)
        dproj = dproj + ds * (w * jnp.cos(w * proj))
    dB = mmT_acc(dproj, t)  # [21, 3]
    dt = dt + _mm(dproj, B)
    dpts_ref[:] = dt * inv_scale

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        dB_ref[:] = dB
        for k in _OC_WKEYS:
            dW_refs[k][:] = dW[k]
            db_refs[k][:] = db[k].reshape(db_refs[k].shape)

    @pl.when(jnp.logical_not(is_first))
    def _():
        dB_ref[:] += dB
        for k in _OC_WKEYS:
            dW_refs[k][:] += dW[k]
            db_refs[k][:] += db[k].reshape(db_refs[k].shape)


def _oc_param_arrays(fc):
    Ws = {
        "in": fc["in_layer"], "m1": fc["mid1"][0], "c": fc["cat_layer"],
        "m2": fc["mid2"][0], "oa": fc["out_alpha"], "cl": fc["color_linear"],
        "oc": fc["out_color"],
    }
    return ([Ws[k]["w"] for k in _OC_WKEYS],
            [Ws[k]["b"][None, :] for k in _OC_WKEYS])


def _oc_rebuild_grads(fc_like, dWs, dbs):
    g = jax.tree.map(jnp.zeros_like, fc_like)
    name = {
        "in": ("in_layer",), "m1": ("mid1", 0), "c": ("cat_layer",),
        "m2": ("mid2", 0), "oa": ("out_alpha",), "cl": ("color_linear",),
        "oc": ("out_color",),
    }
    for i, k in enumerate(_OC_WKEYS):
        path = name[k]
        node = g
        for p in path[:-1] if len(path) > 1 else []:
            node = node[p]
        leaf = node[path[-1]]
        leaf["w"] = dWs[i]
        leaf["b"] = dbs[i].reshape(leaf["b"].shape)
    return g


@functools.lru_cache(maxsize=None)
def _make_occ_fused(scale: float, hidden: int, interpret: bool):
    inv_scale = 1.0 / scale

    def specs(Wl, bl, B):
        def full(a):
            return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                                memory_space=pltpu.VMEM)
        return full(B), [full(w) for w in Wl], [full(b) for b in bl], full

    def fwd_call(fc, peB, pts):
        N = pts.shape[0]
        T = _pick_tile(N)
        Np = -(-N // T) * T
        nt = Np // T
        pts_p = _pad_rows(pts, Np, axis=0)
        Wl, bl = _oc_param_arrays(fc)
        Bspec, Wspecs, bspecs, _ = specs(Wl, bl, peB)
        row3 = pl.BlockSpec((T, 3), lambda t: (t, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((T, 4), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_occ_fwd_kernel, inv_scale, hidden),
            grid=(nt,),
            in_specs=[row3, Bspec] + Wspecs + bspecs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Np, 4), jnp.float32),
            interpret=interpret,
        )(pts_p, peB, *Wl, *bl)
        return out[:N, 0], out[:N, 1:4]

    @jax.custom_vjp
    def f(fc, peB, pts):
        return fwd_call(fc, peB, pts)

    def f_fwd(fc, peB, pts):
        return fwd_call(fc, peB, pts), (fc, peB, pts)

    def f_bwd(res, cot):
        fc, peB, pts = res
        dalpha, drgb = cot
        N = pts.shape[0]
        T = _pick_tile(N)
        Np = -(-N // T) * T
        nt = Np // T
        pts_p = _pad_rows(pts, Np, axis=0)
        dout = _pad_rows(
            jnp.concatenate([dalpha[:, None], drgb], axis=-1), Np, axis=0)
        Wl, bl = _oc_param_arrays(fc)
        Bspec, Wspecs, bspecs, full = specs(Wl, bl, peB)
        row3 = pl.BlockSpec((T, 3), lambda t: (t, 0), memory_space=pltpu.VMEM)
        row4 = pl.BlockSpec((T, 4), lambda t: (t, 0), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            functools.partial(_occ_bwd_kernel, inv_scale, hidden),
            grid=(nt,),
            in_specs=[row3, Bspec] + Wspecs + bspecs + [row4],
            out_specs=[row3, Bspec] + Wspecs + bspecs,
            out_shape=(
                [jax.ShapeDtypeStruct((Np, 3), jnp.float32),
                 jax.ShapeDtypeStruct(peB.shape, jnp.float32)] +
                [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in Wl] +
                [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bl]),
            interpret=interpret,
        )(pts_p, peB, *Wl, *bl, dout)
        dpts = outs[0][:N]
        dB = outs[1]
        dfc = _oc_rebuild_grads(fc, outs[2:9], outs[9:16])
        return dfc, dB, dpts

    f.defvjp(f_fwd, f_bwd)
    return f


def occupancy_fused_apply(fc: dict, pe: dict, pts: jnp.ndarray, *,
                          scale: float, interpret: bool | None = None):
    """Fused background forward: pts [N, 3] -> (alpha [N], rgb [N, 3])."""
    if interpret is None:
        interpret = _auto_interpret()
    hidden = fc["in_layer"]["w"].shape[1]
    return _make_occ_fused(float(scale), int(hidden), bool(interpret))(
        fc, pe["B"], pts)


# ---------------------------------------------------------------------------
# v2: packed-ensemble CodeNeRF kernel ("category-in-lanes")
#
# v1 above grids over (category, row-tile) and pays ~480 serialized tiny MXU
# ops per forward plus lane-relayout costs for the in-kernel PE concats. v2
# eliminates the category grid axis entirely: rows are point indices and all
# C categories live side by side in lanes ([N, C*32] activations), so every
# layer is ONE block-diagonal matmul for the whole ensemble. The PE is
# reformulated as a single matmul against a precomputed frequency-scaled
# basis (B2), so no in-kernel concatenation or unaligned lane slicing exists
# anywhere: per-category slots are 128-lane aligned for S and 32-lane slots
# for activations are only ever touched by whole-array ops.
#
# Block-diagonal packing happens in XLA on param-sized arrays each step
# (einsum with an identity; autodiff extracts the diagonal blocks from the
# dense packed cotangents automatically).
# ---------------------------------------------------------------------------

_SLOT = 128          # per-category S-slot width: 84 low + 42 high + 2 pad
_LOW, _HIGH = 84, 42


def _pack_bd(W: jnp.ndarray) -> jnp.ndarray:
    """[C, i, o] -> block-diagonal [C*i, C*o]."""
    C = W.shape[0]
    eye = jnp.eye(C, dtype=W.dtype)
    return jnp.einsum("cio,cd->cido", W, eye).reshape(
        C * W.shape[1], C * W.shape[2])


def _pack_bias(b: jnp.ndarray) -> jnp.ndarray:
    """[C, o] -> [1, C*o] (slot-ordered)."""
    return b.reshape(1, -1)


def _pack_b2(B: jnp.ndarray) -> jnp.ndarray:
    """PE basis [C, 21, 3] -> frequency-scaled [C, 3, _SLOT] (then block-diag
    [C*3, C*_SLOT] by the caller). Slot layout: [f0..f3 | f4..f5 | 0pad]."""
    C = B.shape[0]
    Bt = jnp.swapaxes(B, 1, 2)  # [C, 3, 21]
    scaled = jnp.stack(
        [Bt * (_PI * (2.0 ** f)) for f in range(_N_FREQS)], axis=2
    )  # [C, 3, 6, 21]
    low = scaled[:, :, :4].reshape(C, 3, _LOW)
    high = scaled[:, :, 4:].reshape(C, 3, _HIGH)
    pad = jnp.zeros((C, 3, _SLOT - _LOW - _HIGH), B.dtype)
    return jnp.concatenate([low, high, pad], axis=-1)


def _pack_rows(W: jnp.ndarray, src_rows: slice, dst_off: int) -> jnp.ndarray:
    """Embed W[:, src_rows, :] into zero rows [C, _SLOT, o] at dst_off."""
    C, _, o = W.shape
    sub = W[:, src_rows, :]
    out = jnp.zeros((C, _SLOT, o), W.dtype)
    return out.at[:, dst_off:dst_off + sub.shape[1], :].set(sub)


def pack_codenerf_ensemble(fc: dict, peB: jnp.ndarray) -> tuple:
    """Stacked cat_fc pytree + PE basis [C, 21, 3] -> packed kernel operands.

    Returns (weights 13-tuple, biases 10-tuple); all differentiable XLA ops
    on param-sized arrays.
    """
    We = fc["encoding_xyz"]["w"]          # [C, 87, 32]
    Wc = fc["cat_layer"]["w"]             # [C, 119, 32]
    Wvd = fc["encoding_viewdir"]["w"]     # [C, 74, 32]
    weights = (
        _pack_bd(_pack_b2(peB)),                          # B2   [3C, 128C]
        _pack_bd(We[:, :3, :]),                           # We_t [3C, 32C]
        _pack_bd(_pack_rows(We, slice(3, 87), 0)),        # We_s [128C, 32C]
        _pack_bd(fc["shape_layers"][0]["w"]),             # Ws0  [32C, 32C]
        _pack_bd(Wc[:, :32, :]),                          # Wc_y
        _pack_bd(Wc[:, 32:35, :]),                        # Wc_t [3C, 32C]
        _pack_bd(_pack_rows(Wc, slice(35, 119), 0)),      # Wc_s [128C, 32C]
        _pack_bd(fc["shape_layers"][1]["w"]),             # Ws1
        _pack_bd(fc["encoding_shape"]["w"]),              # Wen
        _pack_bd(fc["sigma"]["w"]),                       # Wsg  [32C, C]
        _pack_bd(Wvd[:, :32, :]),                         # Wvd_h
        _pack_bd(_pack_rows(Wvd, slice(32, 74), _LOW)),   # Wvd_s [128C, 32C]
        _pack_bd(fc["texture_layers"][0]["w"]),           # Wt0
    ) + (
        _pack_bd(fc["rgb_0"]["w"]),                       # W0 [32C, 16C]
        _pack_bd(fc["rgb_1"]["w"]),                       # W1 [16C, 3C]
    )
    biases = tuple(_pack_bias(fc[k]["b"]) for k in (
        "encoding_xyz", "cat_layer", "encoding_shape", "sigma",
        "encoding_viewdir", "rgb_0", "rgb_1",
    )) + tuple(_pack_bias(fc[g][i]["b"]) for g, i in (
        ("shape_layers", 0), ("shape_layers", 1), ("texture_layers", 0),
    ))
    return weights, biases


_W2_NAMES = ("B2", "We_t", "We_s", "Ws0", "Wc_y", "Wc_t", "Wc_s", "Ws1",
             "Wen", "Wsg", "Wvd_h", "Wvd_s", "Wt0", "W0", "W1")
_B2_NAMES = ("be", "bc", "ben", "bsg", "bvd", "b0", "b1", "bs0", "bs1", "bt0")


def _cn2_chain(pts, zs0, zc, zs1, zt0, W, b, inv_scale):
    """Packed forward chain. pts [T, 3C]; z* [T, 32C]. Returns
    (sg [T, C], color [T, 3C], intermediates)."""
    t = pts * inv_scale
    sinarg = _mm(t, W["B2"])          # [T, 128C]
    S = jnp.sin(sinarg)
    a0 = _mm(t, W["We_t"]) + _mm(S, W["We_s"]) + b["be"]
    r0 = jnp.maximum(a0, 0.0)
    g0 = r0 + zs0
    a1 = _mm(g0, W["Ws0"]) + b["bs0"]
    r1 = jnp.maximum(a1, 0.0)
    g1 = r1 + zc
    a2 = _mm(g1, W["Wc_y"]) + _mm(t, W["Wc_t"]) + _mm(S, W["Wc_s"]) + b["bc"]
    r2 = jnp.maximum(a2, 0.0)
    g2 = r2 + zs1
    a3 = _mm(g2, W["Ws1"]) + b["bs1"]
    r3 = jnp.maximum(a3, 0.0)
    h = _mm(r3, W["Wen"]) + b["ben"]
    sg = (_mm(h, W["Wsg"]) + b["bsg"]) * 10.0
    a4 = _mm(h, W["Wvd_h"]) + _mm(S, W["Wvd_s"]) + b["bvd"]
    r4 = jnp.maximum(a4, 0.0)
    g4 = r4 + zt0
    a5 = _mm(g4, W["Wt0"]) + b["bt0"]
    r5 = jnp.maximum(a5, 0.0)
    a6 = _mm(r5, W["W0"]) + b["b0"]
    r6 = jnp.maximum(a6, 0.0)
    a7 = _mm(r6, W["W1"]) + b["b1"]
    color = jax.nn.sigmoid(a7)
    iv = dict(t=t, sinarg=sinarg, S=S, a0=a0, g0=g0, a1=a1, g1=g1, a2=a2,
              g2=g2, a3=a3, r3=r3, h=h, a4=a4, g4=g4, a5=a5, r5=r5, a6=a6,
              r6=r6, color=color)
    return sg, color, iv


def _cn2_fwd_kernel(inv_scale, *refs):
    refs = iter(refs)
    pts = next(refs)[:]
    zs0, zc, zs1, zt0 = (next(refs)[:] for _ in range(4))
    W = {k: next(refs)[:] for k in _W2_NAMES}
    b = {k: next(refs)[:] for k in _B2_NAMES}
    sg_ref = next(refs)
    col_ref = next(refs)
    sg, color, _ = _cn2_chain(pts, zs0, zc, zs1, zt0, W, b, inv_scale)
    sg_ref[:] = sg
    col_ref[:] = color


def _cn2_bwd_kernel(inv_scale, *refs):
    refs = iter(refs)
    pts = next(refs)[:]
    zs0, zc, zs1, zt0 = (next(refs)[:] for _ in range(4))
    W = {k: next(refs)[:] for k in _W2_NAMES}
    b = {k: next(refs)[:] for k in _B2_NAMES}
    dsg_in = next(refs)[:]   # [T, C]
    dcol = next(refs)[:]     # [T, 3C]

    dpts_ref = next(refs)
    dz_refs = [next(refs) for _ in range(4)]
    dW_refs = {k: next(refs) for k in _W2_NAMES}
    db_refs = {k: next(refs) for k in _B2_NAMES}

    _, _, iv = _cn2_chain(pts, zs0, zc, zs1, zt0, W, b, inv_scale)

    def mmT_acc(x, d):  # x^T @ d
        return jax.lax.dot_general(x, d, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm_T(d, w):  # d @ w^T
        return jax.lax.dot_general(d, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dW = {}
    db = {}
    dsg = dsg_in * 10.0
    da7 = dcol * iv["color"] * (1.0 - iv["color"])
    dW["W1"] = mmT_acc(iv["r6"], da7)
    db["b1"] = jnp.sum(da7, axis=0, keepdims=True)
    da6 = mm_T(da7, W["W1"]) * (iv["a6"] > 0)
    dW["W0"] = mmT_acc(iv["r5"], da6)
    db["b0"] = jnp.sum(da6, axis=0, keepdims=True)
    da5 = mm_T(da6, W["W0"]) * (iv["a5"] > 0)
    dW["Wt0"] = mmT_acc(iv["g4"], da5)
    db["bt0"] = jnp.sum(da5, axis=0, keepdims=True)
    dg4 = mm_T(da5, W["Wt0"])
    da4 = dg4 * (iv["a4"] > 0)
    dW["Wvd_h"] = mmT_acc(iv["h"], da4)
    dW["Wvd_s"] = mmT_acc(iv["S"], da4)
    db["bvd"] = jnp.sum(da4, axis=0, keepdims=True)
    dW["Wsg"] = mmT_acc(iv["h"], dsg)
    db["bsg"] = jnp.sum(dsg, axis=0, keepdims=True)
    dh = mm_T(da4, W["Wvd_h"]) + mm_T(dsg, W["Wsg"])
    dW["Wen"] = mmT_acc(iv["r3"], dh)
    db["ben"] = jnp.sum(dh, axis=0, keepdims=True)
    da3 = mm_T(dh, W["Wen"]) * (iv["a3"] > 0)
    dW["Ws1"] = mmT_acc(iv["g2"], da3)
    db["bs1"] = jnp.sum(da3, axis=0, keepdims=True)
    dg2 = mm_T(da3, W["Ws1"])
    da2 = dg2 * (iv["a2"] > 0)
    dW["Wc_y"] = mmT_acc(iv["g1"], da2)
    dW["Wc_t"] = mmT_acc(iv["t"], da2)
    dW["Wc_s"] = mmT_acc(iv["S"], da2)
    db["bc"] = jnp.sum(da2, axis=0, keepdims=True)
    dg1 = mm_T(da2, W["Wc_y"])
    da1 = dg1 * (iv["a1"] > 0)
    dW["Ws0"] = mmT_acc(iv["g0"], da1)
    db["bs0"] = jnp.sum(da1, axis=0, keepdims=True)
    dg0 = mm_T(da1, W["Ws0"])
    da0 = dg0 * (iv["a0"] > 0)
    dW["We_t"] = mmT_acc(iv["t"], da0)
    dW["We_s"] = mmT_acc(iv["S"], da0)
    db["be"] = jnp.sum(da0, axis=0, keepdims=True)

    dS = mm_T(da0, W["We_s"]) + mm_T(da2, W["Wc_s"]) + mm_T(da4, W["Wvd_s"])
    dsinarg = dS * jnp.cos(iv["sinarg"])
    dW["B2"] = mmT_acc(iv["t"], dsinarg)
    dt = (mm_T(dsinarg, W["B2"]) + mm_T(da0, W["We_t"])
          + mm_T(da2, W["Wc_t"]))
    dpts_ref[:] = dt * inv_scale
    for ref, val in zip(dz_refs, (dg0, dg1, dg2, dg4)):
        ref[:] = val

    is_first = pl.program_id(0) == 0

    @pl.when(is_first)
    def _():
        for k in _W2_NAMES:
            dW_refs[k][:] = dW[k]
        for k in _B2_NAMES:
            db_refs[k][:] = db[k]

    @pl.when(jnp.logical_not(is_first))
    def _():
        for k in _W2_NAMES:
            dW_refs[k][:] += dW[k]
        for k in _B2_NAMES:
            db_refs[k][:] += db[k]


@functools.lru_cache(maxsize=None)
def _make_codenerf_packed(scale: float, interpret: bool, tile: int):
    inv_scale = 1.0 / scale

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def row_spec(f, T):
        return pl.BlockSpec((T, f), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)

    def prep(pts, zs):
        N = pts.shape[0]
        T = tile
        Np = -(-N // T) * T
        return N, T, Np, Np // T, _pad_rows(pts, Np, axis=0), [
            _pad_rows(z, Np, axis=0) for z in zs]

    def fwd_call(weights, biases, pts, zs0, zc, zs1, zt0):
        N, T, Np, nt, pts_p, zs = prep(pts, (zs0, zc, zs1, zt0))
        C3 = pts.shape[1]
        C = C3 // 3
        sg, col = pl.pallas_call(
            functools.partial(_cn2_fwd_kernel, inv_scale),
            grid=(nt,),
            in_specs=([row_spec(C3, T)] + [row_spec(32 * C, T)] * 4 +
                      [full_spec(w) for w in weights] +
                      [full_spec(b) for b in biases]),
            out_specs=(row_spec(C, T), row_spec(3 * C, T)),
            out_shape=(jax.ShapeDtypeStruct((Np, C), jnp.float32),
                       jax.ShapeDtypeStruct((Np, 3 * C), jnp.float32)),
            interpret=interpret,
        )(pts_p, *zs, *weights, *biases)
        return sg[:N], col[:N]

    @jax.custom_vjp
    def f(weights, biases, pts, zs0, zc, zs1, zt0):
        return fwd_call(weights, biases, pts, zs0, zc, zs1, zt0)

    def f_fwd(weights, biases, pts, zs0, zc, zs1, zt0):
        return (fwd_call(weights, biases, pts, zs0, zc, zs1, zt0),
                (weights, biases, pts, zs0, zc, zs1, zt0))

    def f_bwd(res, cot):
        weights, biases, pts, zs0, zc, zs1, zt0 = res
        dsg, dcol = cot
        N, T, Np, nt, pts_p, zs = prep(pts, (zs0, zc, zs1, zt0))
        C3 = pts.shape[1]
        C = C3 // 3
        dsg_p = _pad_rows(dsg, Np, axis=0)
        dcol_p = _pad_rows(dcol, Np, axis=0)
        outs = pl.pallas_call(
            functools.partial(_cn2_bwd_kernel, inv_scale),
            grid=(nt,),
            in_specs=([row_spec(C3, T)] + [row_spec(32 * C, T)] * 4 +
                      [full_spec(w) for w in weights] +
                      [full_spec(b) for b in biases] +
                      [row_spec(C, T), row_spec(3 * C, T)]),
            out_specs=([row_spec(C3, T)] + [row_spec(32 * C, T)] * 4 +
                       [full_spec(w) for w in weights] +
                       [full_spec(b) for b in biases]),
            out_shape=(
                [jax.ShapeDtypeStruct((Np, C3), jnp.float32)] +
                [jax.ShapeDtypeStruct((Np, 32 * C), jnp.float32)] * 4 +
                [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in weights] +
                [jax.ShapeDtypeStruct(b.shape, jnp.float32)
                 for b in biases]),
            interpret=interpret,
        )(pts_p, *zs, *weights, *biases, dsg_p, dcol_p)
        dpts = outs[0][:N]
        dzs = [o[:N] for o in outs[1:5]]
        dweights = tuple(outs[5:5 + len(weights)])
        dbiases = tuple(outs[5 + len(weights):])
        return (dweights, dbiases, dpts, *dzs)

    f.defvjp(f_fwd, f_bwd)
    return f


def codenerf_packed_apply(fc: dict, pe: dict, pts_packed: jnp.ndarray,
                          zs0: jnp.ndarray, zc: jnp.ndarray,
                          zs1: jnp.ndarray, zt0: jnp.ndarray, *,
                          scale: float, tile: int = 256,
                          interpret: bool | None = None):
    """Packed-ensemble fused forward.

    pts_packed: [N, C*3] (point-major, categories in lanes); z*: [N, C*32].
    Returns (sigma [N, C], rgb [N, C, 3]). Differentiable w.r.t. fc, pe and
    all point inputs.
    """
    if interpret is None:
        interpret = _auto_interpret()
    weights, biases = pack_codenerf_ensemble(fc, pe["B"])
    sg, col = _make_codenerf_packed(float(scale), bool(interpret),
                                    int(tile))(
        weights, biases, pts_packed, zs0, zc, zs1, zt0)
    N = pts_packed.shape[0]
    C = pts_packed.shape[1] // 3
    return sg, col.reshape(N, C, 3)
