"""Icosahedral uni-directional positional encoding.

Parity target: `UniDirsEmbed` (ref: src/embedding.py:43-92). The embedding
projects scaled xyz through a trainable 21-direction basis (initialised to
unit icosahedral directions), multiplies by frequency bands 2^0..2^max_deg,
takes sin(pi * .), and prepends the raw scaled xyz:

  emb = [x/s (3), sin(pi * 2^0 * Bx) (21), ..., sin(pi * 2^max_deg * Bx) (21)]

With max_deg=5 that is 3 + 6*21 = 129 dims. The density trunk consumes the
first EMB_SIZE1 = 3 + 4*21 = 87 dims (freqs 2^0..2^3) and the color head the
last EMB_SIZE2 = 2*21 = 42 (freqs 2^4..2^5) — ref: src/trainer.py:20-21.

The basis matrix B is a *trainable* parameter, exactly as in the reference
(its nn.Linear weight is registered with the optimizer, train.py:55,62).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 21 icosahedral unit directions (ref: src/embedding.py:51-73).
ICOSAHEDRON_DIRS = np.array(
    [
        [0.8506508, 0.0, 0.5257311],
        [0.809017, 0.5, 0.309017],
        [0.5257311, 0.8506508, 0.0],
        [1.0, 0.0, 0.0],
        [0.809017, 0.5, -0.309017],
        [0.8506508, 0.0, -0.5257311],
        [0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, -0.8506508],
        [0.5, 0.309017, -0.809017],
        [0.0, 1.0, 0.0],
        [-0.5257311, 0.8506508, 0.0],
        [-0.309017, 0.809017, -0.5],
        [0.0, 0.5257311, 0.8506508],
        [-0.309017, 0.809017, 0.5],
        [0.309017, 0.809017, 0.5],
        [0.5, 0.309017, 0.809017],
        [0.5, -0.309017, 0.809017],
        [0.0, 0.0, 1.0],
        [-0.5, 0.309017, 0.809017],
        [-0.809017, 0.5, 0.309017],
        [-0.809017, 0.5, -0.309017],
    ],
    dtype=np.float32,
)

N_DIRS = 21
DEFAULT_MAX_DEG = 5
EMB_SIZE1 = N_DIRS * (3 + 1) + 3  # 87: raw xyz + freqs 2^0..2^3
EMB_SIZE2 = N_DIRS * (5 + 1) + 3 - EMB_SIZE1  # 42: freqs 2^4..2^5
EMB_SIZE_TOTAL = EMB_SIZE1 + EMB_SIZE2  # 129


def init_params(max_deg: int = DEFAULT_MAX_DEG, scale: float = 2.0) -> dict:
    """PE parameter pytree.

    'B' is trainable; 'scale' and the frequency bands are constants baked in
    at apply time (the reference keeps them as non-trainable buffers,
    src/embedding.py:78-80).
    """
    del max_deg  # bands derived at apply time; kept for API symmetry
    return {"B": jnp.asarray(ICOSAHEDRON_DIRS)}


def frequency_bands(min_deg: int = 0, max_deg: int = DEFAULT_MAX_DEG) -> jnp.ndarray:
    n_freqs = max_deg - min_deg + 1
    return 2.0 ** jnp.linspace(float(min_deg), float(max_deg), n_freqs)


# --- fast sin(pi*x) ---------------------------------------------------------
# The embedding evaluates ~5.7M transcendentals per train step (sin in the
# forward, cos in the backward); XLA's general-argument sin's range reduction
# makes those fusions ~40% of step time (scripts/exp_trace_ops.py). sin(pi*x)
# reduces exactly: r = x - round(x) in [-1/2, 1/2], sign flip by parity of
# round(x), then a degree-9 odd minimax polynomial (max abs err 3.4e-9 —
# below f32 ulp at these argument magnitudes; fit in scripts/exp_sinpi.py).

# Switch for A/B measurement (scripts/exp_sinpi3.py); production default is
# set from the measured winner.
_FAST_SINPI = True

_SINPI_C = (3.1415925801, -5.1677068823, 2.5500314321,
            -5.9804549862e-01, 7.7220761261e-02)
_COSPI_C = (9.9999995351e-01, -4.9347928654, 4.0584120689,
            -1.3318812806, 2.1969928934e-01)


def _reduce_half(x: jnp.ndarray):
    n = jnp.round(x)
    r = x - n
    # (-1)^n without int conversion: parity of round(x) (mod is in [0, 2))
    sign = jnp.where(jnp.mod(n, 2.0) >= 1.0, -1.0, 1.0)
    return r, sign


@jax.custom_jvp
def sinpi(x: jnp.ndarray) -> jnp.ndarray:
    """sin(pi * x) via exact range reduction + odd minimax polynomial."""
    r, sign = _reduce_half(x)
    u = r * r
    c0, c1, c2, c3, c4 = _SINPI_C
    p = c0 + u * (c1 + u * (c2 + u * (c3 + u * c4)))
    return sign * r * p


def cospi(x: jnp.ndarray) -> jnp.ndarray:
    """cos(pi * x) via the same reduction + even minimax polynomial."""
    r, sign = _reduce_half(x)
    u = r * r
    c0, c1, c2, c3, c4 = _COSPI_C
    return sign * (c0 + u * (c1 + u * (c2 + u * (c3 + u * c4))))


@sinpi.defjvp
def _sinpi_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return sinpi(x), jnp.pi * cospi(x) * dx


def apply(params: dict, x: jnp.ndarray, *, scale: float,
          max_deg: int = DEFAULT_MAX_DEG,
          act_dtype: jnp.dtype | None = None) -> jnp.ndarray:
    """x: [..., 3] -> [..., 3 + (max_deg+1)*21] embedding
    (ref: src/embedding.py:82-92).

    Flattening order matches the reference: frequency-major
    ([f0 d0..d20, f1 d0..d20, ...]), so the 87/42 split picks low/high bands.

    Precision note: the projection runs at HIGHEST matmul precision. With
    TPU's default (inputs truncated to bf16) the ~0.4% projection error is
    amplified by the band scale to ~1 radian of phase noise on the
    highest-frequency sins — silently corrupting the fine-detail features.
    K=3, so exact f32 costs nothing.

    act_dtype: optional STORAGE dtype for the returned embedding (compute
    stays f32 — the HIGHEST projection and the sinpi polynomial are
    unaffected). bf16 halves the embedding's HBM traffic while the consuming
    matmul would truncate to bf16 anyway (cfg.bf16_activations).
    """
    t = x / scale
    proj = jnp.dot(t, params["B"].T,
                   precision=jax.lax.Precision.HIGHEST)  # [..., 21]
    bands = frequency_bands(0, max_deg).astype(proj.dtype)
    xb = proj[..., None, :] * bands[:, None]  # [..., n_freqs, 21]
    xb = xb.reshape(*proj.shape[:-1], -1)
    sin_fn = sinpi if _FAST_SINPI else (lambda v: jnp.sin(jnp.pi * v))
    emb = jnp.concatenate([t, sin_fn(xb)], axis=-1)
    return emb if act_dtype is None else emb.astype(act_dtype)


def positional_encoding(x: jnp.ndarray, num_encoding_functions: int = 6,
                        include_input: bool = True,
                        log_sampling: bool = True) -> jnp.ndarray:
    """Legacy NeRF sin/cos positional encoding (ref: src/embedding.py:4-41;
    present in the reference but unused by training — kept for API parity).

    x: [..., D] -> [..., D * (include_input + 2 * num_encoding_functions)].
    """
    parts = [x] if include_input else []
    if log_sampling:
        bands = 2.0 ** jnp.linspace(0.0, num_encoding_functions - 1,
                                    num_encoding_functions)
    else:
        bands = jnp.linspace(2.0 ** 0.0, 2.0 ** (num_encoding_functions - 1),
                             num_encoding_functions)
    for f in bands:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)
