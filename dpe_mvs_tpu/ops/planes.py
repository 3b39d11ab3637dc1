"""Random / perturbed plane-hypothesis generation.

Deterministic ``jax.random`` replacements for the reference's curand device
code (DPE.cu:361-451). The reference seeds curand from ``clock64()``
(DPE.cu:1032) so its outputs are not reproducible run-to-run; here every draw
is keyed, which is strictly stronger and makes testing tractable.

Distribution notes:
  - ``GenerateRandomNormal`` (DPE.cu:361-387) draws a uniform direction on the
    sphere by Marsaglia rejection; we draw the same distribution directly via
    (z, phi) sampling — no rejection loop, TPU-friendly.
  - ``GeneratePertubedPlaneHypothesis``'s rejection condition
    ``depth < min && depth > max`` (DPE.cu:446) can never hold, so it is a
    single draw; same for ``PlaneHypothesisRefinement*`` (DPE.cu:1090).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import cameras as geo


def random_unit_sphere(key, shape):
    """Uniform direction on S^2, shape (*shape, 3)."""
    kz, kp = jax.random.split(key)
    z = jax.random.uniform(kz, shape, minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def random_normal_facing(key, cam: geo.Camera, px, py, depth):
    """Random unit normal flipped to face the camera
    (``GenerateRandomNormal``, DPE.cu:361-387)."""
    n = random_unit_sphere(key, px.shape)
    view = geo.view_direction(cam, px, py)
    dot = jnp.sum(n * view, axis=-1, keepdims=True)
    return jnp.where(dot > 0.0, -n, n)


def perturbed_normal(key, cam: geo.Camera, px, py, normal, perturbation):
    """Small random Euler rotation of the normal; keep the original if the
    rotated normal faces away (``GeneratePerturbedNormal``, DPE.cu:389-424)."""
    a = jax.random.uniform(key, (*px.shape, 3), minval=-0.5, maxval=0.5)
    a = a * perturbation
    s1, s2, s3 = jnp.sin(a[..., 0]), jnp.sin(a[..., 1]), jnp.sin(a[..., 2])
    c1, c2, c3 = jnp.cos(a[..., 0]), jnp.cos(a[..., 1]), jnp.cos(a[..., 2])
    R = jnp.stack(
        [
            c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2,
            c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1,
            -s2, c2 * s1, c1 * c2,
        ],
        axis=-1,
    ).reshape(*px.shape, 3, 3)
    n_rot = jnp.einsum("...ij,...j->...i", R, normal)
    # View direction at depth 1 (DPE.cu:391).
    view = geo.view_direction(cam, px, py)
    facing_away = jnp.sum(n_rot * view, axis=-1, keepdims=True) >= 0.0
    n_out = jnp.where(facing_away, normal, n_rot)
    return n_out / jnp.linalg.norm(n_out, axis=-1, keepdims=True)


def random_plane(key, cam: geo.Camera, px, py, depth_min, depth_max):
    """Random depth + random facing normal -> plane (n, d)
    (``GenerateRandomPlaneHypothesis``, DPE.cu:426-432)."""
    kd, kn = jax.random.split(key)
    depth = jax.random.uniform(kd, px.shape, minval=depth_min, maxval=depth_max)
    n = random_normal_facing(kn, cam, px, py, depth)
    return geo.plane_from_depth_normal(cam, px, py, depth, n)
