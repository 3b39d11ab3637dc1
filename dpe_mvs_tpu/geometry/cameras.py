"""Projective geometry for plane-hypothesis PatchMatch, as pure jnp.

TPU-native re-derivation of the reference device library
(``csrc/DPE-MVS/DPE.cu:5-555``): instead of per-thread scalar math, every
function here is written over batched ``(..., )`` pixel arrays so XLA maps it
onto the VPU, and per-view relative transforms are precomputed once per
problem instead of being re-derived inside every cost call
(``ComputeHomography`` recomputes R_rel/t_rel per pixel per candidate —
on TPU we hoist that).

All small (3x3) contractions are deliberately unrolled into elementwise ops:
``einsum``/``dot`` would route 3-element contractions through the MXU's
reduced-precision matmul path, which is both slower (tiny matmuls) and less
accurate (bf16 accumulation visibly corrupts pixel-space geometry).

Conventions (identical to the reference):
  - ``R`` is world->camera rotation, ``t`` world->camera translation:
    x_cam = R @ X_world + t;  camera center c = -R^T t  (DPE.cpp:362-367).
  - A plane hypothesis is ``(nx, ny, nz, d)`` with the normal in the *reference
    camera* frame and ``d = -(n . X_cam)`` the signed distance to the camera
    origin (``GetDistance2Origin``, DPE.cu:337-342).
  - Pixel coordinates are 0-based integer centers, matching the reference's
    ``tex2D(img, x + 0.5, y + 0.5)`` addressing.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def mat3_vec(M, v):
    """(..., 3, 3) @ (..., 3) -> (..., 3), unrolled (no MXU)."""
    return jnp.stack(
        [
            M[..., 0, 0] * v[..., 0] + M[..., 0, 1] * v[..., 1] + M[..., 0, 2] * v[..., 2],
            M[..., 1, 0] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 1, 2] * v[..., 2],
            M[..., 2, 0] * v[..., 0] + M[..., 2, 1] * v[..., 1] + M[..., 2, 2] * v[..., 2],
        ],
        axis=-1,
    )


def mat3_t_vec(M, v):
    """(..., 3, 3)^T @ (..., 3) -> (..., 3), unrolled."""
    return jnp.stack(
        [
            M[..., 0, 0] * v[..., 0] + M[..., 1, 0] * v[..., 1] + M[..., 2, 0] * v[..., 2],
            M[..., 0, 1] * v[..., 0] + M[..., 1, 1] * v[..., 1] + M[..., 2, 1] * v[..., 2],
            M[..., 0, 2] * v[..., 0] + M[..., 1, 2] * v[..., 1] + M[..., 2, 2] * v[..., 2],
        ],
        axis=-1,
    )


def mat3_mat3(A, B):
    """(..., 3, 3) @ (..., 3, 3), unrolled."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                A[..., i, 0] * B[..., 0, j]
                + A[..., i, 1] * B[..., 1, j]
                + A[..., i, 2] * B[..., 2, j]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mat3_mat3_t(A, B):
    """A @ B^T, unrolled."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                A[..., i, 0] * B[..., j, 0]
                + A[..., i, 1] * B[..., j, 1]
                + A[..., i, 2] * B[..., j, 2]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


class Camera(NamedTuple):
    """Pinhole camera. All fields can carry leading batch (view) dims."""

    K: jnp.ndarray        # (..., 3, 3) intrinsics
    R: jnp.ndarray        # (..., 3, 3) world->cam rotation
    t: jnp.ndarray        # (..., 3)    world->cam translation

    @property
    def center(self) -> jnp.ndarray:
        """Camera center in world coords: c = -R^T t (DPE.cpp:362-367)."""
        return -mat3_t_vec(self.R, self.t)

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    @property
    def cx(self):
        return self.K[..., 0, 2]

    @property
    def cy(self):
        return self.K[..., 1, 2]


def scale_camera(cam: Camera, scale_x: float, scale_y: float) -> Camera:
    """Rescale intrinsics for a resized image (DPE.cpp:814-817)."""
    S = np.array([[scale_x, 1.0, scale_x], [1.0, scale_y, scale_y], [1.0, 1.0, 1.0]])
    return Camera(K=cam.K * jnp.asarray(S, cam.K.dtype), R=cam.R, t=cam.t)


def backproject(cam: Camera, x, y, depth):
    """Pixel + depth -> 3D point in camera frame (``Get3DPoint``, DPE.cu:309-314).

    x, y, depth: broadcastable arrays. Returns (..., 3).
    """
    X = depth * (x - cam.cx) / cam.fx
    Y = depth * (y - cam.cy) / cam.fy
    Z = jnp.broadcast_to(depth, jnp.broadcast_shapes(X.shape, Y.shape))
    return jnp.stack(jnp.broadcast_arrays(X, Y, Z), axis=-1)


def view_direction(cam: Camera, x, y):
    """Unit view ray through pixel (``GetViewDirection``, DPE.cu:323-335)."""
    v = backproject(cam, x, y, jnp.ones_like(jnp.asarray(x, jnp.float32)))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def dist_to_origin(cam: Camera, x, y, depth, normal):
    """Plane distance term d = -(n . X) (``GetDistance2Origin``, DPE.cu:337-342).

    normal: (..., 3). Returns scalar array broadcast over pixels.
    """
    X = backproject(cam, x, y, depth)
    return -jnp.sum(normal * X, axis=-1)


def depth_from_plane(cam: Camera, plane, x, y):
    """Depth of plane (n, d) at pixel (``ComputeDepthfromPlaneHypothesis``,
    DPE.cu:356-359)."""
    n = plane[..., :3]
    d = plane[..., 3]
    denom = (
        (x - cam.cx) / cam.fx * n[..., 0]
        + (y - cam.cy) / cam.fy * n[..., 1]
        + n[..., 2]
    )
    return -d / denom


def plane_from_depth_normal(cam: Camera, x, y, depth, normal):
    """Assemble (n, d) plane hypothesis from a depth + normal at a pixel."""
    d = dist_to_origin(cam, x, y, depth, normal)
    return jnp.concatenate([jnp.broadcast_to(normal, (*d.shape, 3)), d[..., None]],
                           axis=-1)


def relative_transform(ref: Camera, src: Camera):
    """Per-source-view relative pose (hoisted from ``ComputeHomography``,
    DPE.cu:455-481): R_rel = R_src R_ref^T, t_rel = R_src (c_ref - c_src)."""
    R_rel = mat3_mat3_t(src.R, ref.R)
    t_rel = mat3_vec(src.R, ref.center - src.center)
    return R_rel, t_rel


def homography_from_plane(ref: Camera, src: Camera, plane, R_rel=None, t_rel=None):
    """Plane-induced homography H = K_s (R_rel - t_rel n^T / d) K_r^{-1}
    (``ComputeHomography``, DPE.cu:453-513).

    plane: (..., 4) in ref-camera frame. Returns (..., 3, 3) mapping ref pixel
    homogeneous coords to src pixel homogeneous coords.
    """
    if R_rel is None or t_rel is None:
        R_rel, t_rel = relative_transform(ref, src)
    n = plane[..., :3]
    d = plane[..., 3:4]
    M = R_rel - t_rel[..., :, None] * (n / d)[..., None, :]

    # K_ref^{-1} applied exactly as the reference does (no skew in K_ref):
    # columns scaled by 1/fx, 1/fy; third column shifted (DPE.cu:493-502).
    fx = ref.fx[..., None, None]
    fy = ref.fy[..., None, None]
    cx = ref.cx[..., None, None]
    cy = ref.cy[..., None, None]
    c0 = M[..., :, 0:1] / fx
    c1 = M[..., :, 1:2] / fy
    c2 = M[..., :, 2:3] - c0 * cx - c1 * cy
    Mk = jnp.concatenate([c0, c1, c2], axis=-1)
    return mat3_mat3(src.K, Mk)


def apply_homography(H, x, y):
    """Transfer pixel coords through H (``ComputeCorrespondingPoint``,
    DPE.cu:515-522). H: (..., 3, 3); x, y broadcastable against H[..., 0, 0]."""
    px = H[..., 0, 0] * x + H[..., 0, 1] * y + H[..., 0, 2]
    py = H[..., 1, 0] * x + H[..., 1, 1] * y + H[..., 1, 2]
    pz = H[..., 2, 0] * x + H[..., 2, 1] * y + H[..., 2, 2]
    return px / pz, py / pz


def cam_point_to_world(cam: Camera, X_cam):
    """Camera-frame point -> world (``Get3DPointonWorld_cu``, DPE.cu:881-901)."""
    return mat3_t_vec(cam.R, X_cam) + cam.center


def backproject_to_world(cam: Camera, x, y, depth):
    """Pixel + depth -> world-frame 3D point."""
    return cam_point_to_world(cam, backproject(cam, x, y, depth))


def project_to_camera(cam: Camera, X_world):
    """World point -> (pixel x, pixel y, depth) (``ProjectonCamera_cu``,
    DPE.cu:903-913)."""
    Xc = mat3_vec(cam.R, X_world) + cam.t
    p = mat3_vec(cam.K, Xc)
    depth = p[..., 2]
    return p[..., 0] / depth, p[..., 1] / depth, depth


def normal_cam_to_world(cam: Camera, n):
    """Rotate a ref-camera-frame normal to world (``TransformNormal``,
    DPE.cu:524-532): n_world = R^T n."""
    return mat3_t_vec(cam.R, n)


def normal_world_to_cam(cam: Camera, n):
    """Rotate a world-frame normal into the camera frame
    (``TransformNormal2RefCam``, DPE.cu:534-542): n_cam = R n."""
    return mat3_vec(cam.R, n)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(H, W) arrays of pixel x and y coordinates."""
    y = jnp.arange(height, dtype=dtype)[:, None]
    x = jnp.arange(width, dtype=dtype)[None, :]
    return jnp.broadcast_to(x, (height, width)), jnp.broadcast_to(y, (height, width))
