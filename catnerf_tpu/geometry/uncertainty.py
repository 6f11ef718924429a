"""Uncertainty-field template scoring (registration stage 2, TPU part).

Parity target: `get_uncertainty_fields`
(ref: src/category_registration.py:58-177): cast a 100x100 spherical shell
of inward rays around each object, evaluate its pretrained vMAP occupancy
field along 96 stratified bins, compute the termination-probability entropy
per ray, map the heuristic sum(term)*exp(-entropy/2) through the
double-sigmoid reliability curve (ref: src/utils.py:553-559), and count
reliable directions -> the per-object completeness score used for template
selection.

The field evaluation (10k rays x 96 bins x MLP) runs jitted on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.models import embedding, occupancy
from catnerf_tpu.ops import render as render_ops
from catnerf_tpu.ops.sampling import stratified_bins

N_DIRS_PHI = 100
N_DIRS_THETA = 100
N_BINS = 96


def calculate_reliability(metric: np.ndarray, eta: float = 0.9,
                          m1: float = 0.1, m2: float = 0.15,
                          M1: float = 0.57, M2: float = 0.65) -> np.ndarray:
    """Double-sigmoid reliability band (ref: src/utils.py:553-559)."""
    alpha_m = 2 * np.log(eta / (1 - eta)) / (m2 - m1)
    beta_m = (m1 + m2) / 2
    alpha_M = 2 * np.log(eta / (1 - eta)) / (M2 - M1)
    beta_M = (M1 + M2) / 2
    return (1.0 / (1.0 + np.exp(alpha_m * (metric - beta_m)))
            + 1.0 / (1.0 + np.exp(-alpha_M * (metric - beta_M))))


def spherical_ray_grid() -> np.ndarray:
    """Unit directions over a (100, 100) phi/theta grid
    (ref: src/category_registration.py:96-104)."""
    phi = np.linspace(0, np.pi, N_DIRS_PHI)
    theta = np.linspace(0, 2 * np.pi, N_DIRS_THETA)
    phi, theta = np.meshgrid(phi, theta, indexing="xy")
    x = np.sin(phi) * np.cos(theta)
    y = np.sin(phi) * np.sin(theta)
    z = np.cos(phi)
    return np.stack([x, y, z], -1).reshape(-1, 3)


@jax.jit
def _term_probs_field(pe_params, fc_params, rays_o, viewdirs, z_vals,
                      pe_scale):
    # pe_scale is TRACED: it is only used as x/scale inside embedding.apply,
    # and making it static forced one full XLA recompile (20-45 s on the
    # tunnel) per distinct object scale — one per object in a scene.
    xyz = rays_o[:, None, :] + viewdirs[:, None, :] * z_vals[..., None]
    emb = embedding.apply(pe_params, xyz, scale=pe_scale)
    alpha, _ = occupancy.apply(fc_params, emb, do_color=False)
    # NB the reference applies sigmoid(10 * alpha) on top of the model's own
    # x10 logit scale (ref: src/category_registration.py:150) — an extra
    # sharpening unique to this stage; preserved.
    occ = jax.nn.sigmoid(10.0 * alpha[..., 0])
    return render_ops.occupancy_to_termination(occ)


def uncertainty_score(field_params: dict, points: np.ndarray,
                      name: str = "replica", use_reliability: bool = True,
                      key=None):
    """Per-object reliability count (ref: src/category_registration.py:
    112-177). field_params: {'pe', 'fc', 'obj_scale'} from the converted
    vMAP checkpoint. points: the instance's accumulated cloud (world frame).

    Returns (count, entropies, metric)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    pts = np.asarray(points)
    bound = np.maximum(pts.max(0) - pts.min(0), 0.10)
    r = float(1.2 * np.sqrt(np.square(bound / 2.0).sum()))

    dirs = spherical_ray_grid()
    rays_o_o = (r * dirs).astype(np.float32)
    viewdir = (-dirs).astype(np.float32)
    if name == "replica":
        center = (pts.max(0) + pts.min(0)) / 2.0
    else:  # noisy real-world clouds: mean
        center = pts.mean(0)
    rays_o = rays_o_o + center.astype(np.float32)
    # Self-pretrained fields (geometry/field_pretrain.py) live in a
    # cloud-centered frame; shift queries into it. vMAP-converted fields
    # have no 'center' (identity shift).
    if "center" in field_params:
        rays_o = rays_o - np.asarray(field_params["center"], np.float32)

    n_rays = rays_o.shape[0]
    z_vals = stratified_bins(
        key, jnp.zeros((n_rays,)), jnp.full((n_rays,), 2.0 * r), N_BINS)

    term = np.asarray(_term_probs_field(
        field_params["pe"], field_params["fc"], jnp.asarray(rays_o),
        jnp.asarray(viewdir), z_vals,
        jnp.float32(field_params["obj_scale"])))

    entropies = np.sum(-term * np.log(term + 1e-10), axis=-1)
    if use_reliability:
        heuristic = term.sum(-1) * np.exp(-0.5 * entropies)
        reliability = calculate_reliability(heuristic)
        metric = 1.0 - reliability
        count = int((metric < 0.5).sum())
    else:
        metric = entropies
        count = -1  # thresholding against the class max happens upstream
    return count, entropies, metric
