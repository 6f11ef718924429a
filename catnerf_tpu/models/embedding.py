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


def apply(params: dict, x: jnp.ndarray, *, scale: float,
          max_deg: int = DEFAULT_MAX_DEG) -> jnp.ndarray:
    """x: [..., 3] -> [..., 3 + (max_deg+1)*21] embedding
    (ref: src/embedding.py:82-92).

    Flattening order matches the reference: frequency-major
    ([f0 d0..d20, f1 d0..d20, ...]), so the 87/42 split picks low/high bands.

    Precision note: the projection runs at HIGHEST matmul precision. With
    TPU's default (inputs truncated to bf16) the ~0.4% projection error is
    amplified by the band scale to ~1 radian of phase noise on the
    highest-frequency sins — silently corrupting the fine-detail features.
    K=3, so exact f32 costs nothing.
    """
    t = x / scale
    proj = jnp.dot(t, params["B"].T,
                   precision=jax.lax.Precision.HIGHEST)  # [..., 21]
    bands = frequency_bands(0, max_deg).astype(proj.dtype)
    xb = proj[..., None, :] * bands[:, None]  # [..., n_freqs, 21]
    xb = xb.reshape(*proj.shape[:-1], -1)
    return jnp.concatenate([t, jnp.sin(xb * jnp.pi)], axis=-1)


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
