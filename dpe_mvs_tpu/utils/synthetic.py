"""Synthetic MVS scenes with known ground truth.

The reference has no tests (SURVEY.md §4); differential validation is done on
rendered scenes where the true depth is analytic: textured planes (and a
two-plane step) observed by a small ring of cameras. Scenes are written in the
reference's directory layout (images/, cams/, pair.txt) so the full pipeline
consumes them unchanged.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from ..io import formats


def procedural_texture(rng: np.random.Generator, size: int = 1024) -> np.ndarray:
    """Smooth but feature-rich grayscale texture in [0, 255]."""
    tex = np.zeros((size, size), np.float32)
    for octave, amp in [(8, 0.5), (32, 0.3), (128, 0.2)]:
        g = rng.standard_normal((octave, octave)).astype(np.float32)
        tex += amp * cv2.resize(g, (size, size), interpolation=cv2.INTER_CUBIC)
    tex -= tex.min()
    tex /= max(tex.max(), 1e-6)
    return (tex * 235.0 + 10.0).astype(np.float32)


@dataclasses.dataclass
class SyntheticScene:
    folder: Path
    gt_depths: List[np.ndarray]        # per-view (H, W) float32
    gt_normals: List[np.ndarray]       # per-view (H, W, 3) world-frame
    Ks: List[np.ndarray]
    Rs: List[np.ndarray]
    ts: List[np.ndarray]
    weak_region: Optional[np.ndarray] = None  # texture-suppressed area, view 0


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0, -1.0, 0])):
    """World->cam extrinsics of a camera at ``eye`` looking at ``target``."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


def make_plane_scene(
    folder,
    *,
    width: int = 160,
    height: int = 120,
    num_views: int = 4,
    depth0: float = 4.0,
    tilt: float = 0.15,
    step: bool = False,
    weak_patch: bool = False,
    seed: int = 0,
) -> SyntheticScene:
    """Render a tilted textured plane (optionally with a depth step and a
    texture-less patch) from a ring of cameras and write a dense folder."""
    rng = np.random.default_rng(seed)
    folder = Path(folder)
    (folder / "images").mkdir(parents=True, exist_ok=True)
    (folder / "cams").mkdir(parents=True, exist_ok=True)

    f = 0.9 * width
    K = np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1]],
                 np.float32)
    tex = procedural_texture(rng)
    tex_scale = 80.0  # world-units -> texture pixels

    # Plane(s) in world coords: n . X = c. Base plane tilted about x-axis.
    n1 = np.array([0.0, np.sin(tilt), -np.cos(tilt)], np.float32)
    c1 = -depth0  # passes through (0, 0, depth0) when tilt=0
    n1 = n1 / np.linalg.norm(n1)
    c1 = float(n1 @ np.array([0, 0, depth0]))
    # Secondary (nearer) plane for the step, over x > 0.3 * extent.
    n2 = n1
    c2 = float(n1 @ np.array([0, 0, depth0 * 0.8]))

    radius = 0.25
    Ks, Rs, ts = [], [], []
    gt_depths, gt_normals = [], []
    weak_region_v0 = None
    pairs = []

    for v in range(num_views):
        ang = 2 * np.pi * v / max(num_views, 1)
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0],
                       np.float32)
        if v == 0:
            eye = np.zeros(3, np.float32)
        R, t = _look_at(eye, np.array([0, 0, depth0], np.float32))

        ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
        rays = np.stack([(xs - K[0, 2]) / K[0, 0],
                         (ys - K[1, 2]) / K[1, 1],
                         np.ones_like(xs)], axis=-1)
        rays_w = rays @ R  # R^T applied row-wise
        eye_w = eye

        def hit(n, c):
            denom = rays_w @ n
            s = (c - eye_w @ n) / np.where(np.abs(denom) > 1e-9, denom, 1e-9)
            return s

        s1 = hit(n1, c1)
        Xw = eye_w + rays_w * s1[..., None]
        use2 = np.zeros((height, width), bool)
        if step:
            s2 = hit(n2, c2)
            X2 = eye_w + rays_w * s2[..., None]
            use2 = (X2[..., 0] > 0.35) & (s2 > 0)
            Xw = np.where(use2[..., None], X2, Xw)
        depth = (Xw - eye_w) @ R[2]  # z in camera frame
        # n1/n2 already face the cameras (negative world-z component).
        normal = np.where(use2[..., None], n2, n1)

        u = np.mod(Xw[..., 0] * tex_scale, tex.shape[1] - 1)
        w_ = np.mod(Xw[..., 1] * tex_scale, tex.shape[0] - 1)
        img = cv2.remap(tex, u.astype(np.float32), w_.astype(np.float32),
                        cv2.INTER_LINEAR)
        if weak_patch:
            # Suppress texture in a central band: weak-texture region.
            wy0, wy1 = int(0.35 * height), int(0.65 * height)
            wx0, wx1 = int(0.2 * width), int(0.6 * width)
            band = np.zeros((height, width), bool)
            band[wy0:wy1, wx0:wx1] = True
            img = np.where(band, float(img.mean()), img)
            if v == 0:
                weak_region_v0 = band

        cv2.imwrite(str(folder / "images" / f"{v:08d}.jpg"),
                    np.clip(img, 0, 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        dmin = float(depth.min() * 0.9)
        dmax = float(depth.max() * 1.1)
        formats.write_cam_txt(folder / "cams" / f"{v:08d}_cam.txt",
                              K, R, t, dmin, (dmax - dmin) / 192.0, 192, dmax)
        Ks.append(K.copy())
        Rs.append(R)
        ts.append(t)
        gt_depths.append(depth.astype(np.float32))
        gt_normals.append(normal.astype(np.float32))
        pairs.append((v, [(s, 100.0) for s in range(num_views) if s != v]))

    formats.write_pair_txt(folder / "pair.txt", pairs)
    return SyntheticScene(folder=folder, gt_depths=gt_depths,
                          gt_normals=gt_normals, Ks=Ks, Rs=Rs, ts=ts,
                          weak_region=weak_region_v0)


def make_rich_scene(
    folder,
    *,
    width: int = 640,
    height: int = 480,
    num_views: int = 10,
    depth0: float = 4.0,
    weak_fraction: float = 0.25,
    seed: int = 0,
) -> SyntheticScene:
    """A harder ground-truth scene: two oblique planes, a sphere cap (curved
    surface), a foreground occluder slab, and large *view-consistent*
    weak-texture regions (blanked in texture space, so every view sees the
    same textureless world area). Ray-cast per view: nearest positive hit
    over all surfaces — occlusions fall out naturally."""
    rng = np.random.default_rng(seed)
    folder = Path(folder)
    (folder / "images").mkdir(parents=True, exist_ok=True)
    (folder / "cams").mkdir(parents=True, exist_ok=True)

    f = 0.9 * width
    K = np.array([[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1]],
                 np.float32)
    tex = procedural_texture(rng)
    # View-consistent weak regions: blank rectangles of the texture itself.
    n_blank = max(1, int(weak_fraction * 8))
    for _ in range(n_blank):
        ty = rng.integers(0, tex.shape[0] - tex.shape[0] // 3)
        tx = rng.integers(0, tex.shape[1] - tex.shape[1] // 3)
        th = rng.integers(tex.shape[0] // 6, tex.shape[0] // 3)
        tw = rng.integers(tex.shape[1] // 6, tex.shape[1] // 3)
        tex[ty:ty + th, tx:tx + tw] = float(tex.mean())
    tex_scale = 80.0

    # Surfaces. Base plane tilted about x; side plane strongly oblique about
    # y covering x > 0.45; sphere cap bulging toward the cameras; occluder
    # slab floating nearer, over a small (x, y) window.
    tilt = 0.18
    n1 = np.array([0.0, np.sin(tilt), -np.cos(tilt)], np.float32)
    n1 /= np.linalg.norm(n1)
    c1 = float(n1 @ np.array([0, 0, depth0]))
    obl = 0.5
    n2 = np.array([np.sin(obl), 0.0, -np.cos(obl)], np.float32)
    n2 /= np.linalg.norm(n2)
    c2 = float(n2 @ np.array([0.45, 0, depth0 * 0.97]))
    sph_c = np.array([-0.45, -0.25, depth0 * 0.92], np.float32)
    sph_r = 0.5
    n4 = np.array([0.0, 0.0, -1.0], np.float32)
    c4 = float(n4 @ np.array([0, 0, depth0 * 0.55]))

    radius = 0.3
    Ks, Rs, ts = [], [], []
    gt_depths, gt_normals = [], []
    pairs = []

    for v in range(num_views):
        ang = 2 * np.pi * v / max(num_views, 1)
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0],
                       np.float32)
        if v == 0:
            eye = np.zeros(3, np.float32)
        R, t = _look_at(eye, np.array([0, 0, depth0], np.float32))

        ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
        rays = np.stack([(xs - K[0, 2]) / K[0, 0],
                         (ys - K[1, 2]) / K[1, 1],
                         np.ones_like(xs)], axis=-1)
        rays_w = rays @ R
        BIG = 1e30

        def plane_hit(n, c, limit=None):
            denom = rays_w @ n
            s = (c - eye @ n) / np.where(np.abs(denom) > 1e-9, denom, 1e-9)
            ok = s > 0.1
            if limit is not None:
                X = eye + rays_w * s[..., None]
                ok &= limit(X)
            return np.where(ok, s, BIG), np.broadcast_to(
                n, rays_w.shape).copy()

        s1, nn1 = plane_hit(n1, c1)
        s2, nn2 = plane_hit(
            n2, c2, limit=lambda X: X[..., 0] > 0.45)
        # Sphere: |eye + s d - C|^2 = r^2, smaller positive root.
        d = rays_w
        oc = eye - sph_c
        b = 2.0 * (d * oc).sum(-1)
        a = (d * d).sum(-1)
        cq = float(oc @ oc) - sph_r * sph_r
        disc = b * b - 4 * a * cq
        sq = np.sqrt(np.maximum(disc, 0.0))
        s3 = (-b - sq) / (2 * a)
        s3 = np.where((disc > 0) & (s3 > 0.1), s3, BIG)
        X3 = eye + d * s3[..., None]
        nn3 = (X3 - sph_c) / sph_r
        flip = (nn3 * d).sum(-1) > 0
        nn3 = np.where(flip[..., None], -nn3, nn3)
        s4, nn4 = plane_hit(
            n4, c4,
            limit=lambda X: (np.abs(X[..., 0] - 0.1) < 0.22) &
                            (np.abs(X[..., 1] - 0.3) < 0.15))

        ss = np.stack([s1, s2, s3, s4])
        nns = np.stack([nn1, nn2, nn3, nn4])
        pick = np.argmin(ss, axis=0)
        s = np.take_along_axis(ss, pick[None], axis=0)[0]
        normal = np.take_along_axis(
            nns, pick[None, ..., None], axis=0)[0]
        Xw = eye + rays_w * s[..., None]
        depth = (Xw - eye) @ R[2]

        u = np.mod(Xw[..., 0] * tex_scale, tex.shape[1] - 1)
        w_ = np.mod(Xw[..., 1] * tex_scale, tex.shape[0] - 1)
        img = cv2.remap(tex, u.astype(np.float32), w_.astype(np.float32),
                        cv2.INTER_LINEAR)
        cv2.imwrite(str(folder / "images" / f"{v:08d}.jpg"),
                    np.clip(img, 0, 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, 98])
        dmin = float(depth.min() * 0.9)
        dmax = float(depth.max() * 1.1)
        formats.write_cam_txt(folder / "cams" / f"{v:08d}_cam.txt",
                              K, R, t, dmin, (dmax - dmin) / 192.0, 192, dmax)
        Ks.append(K.copy())
        Rs.append(R)
        ts.append(t)
        gt_depths.append(depth.astype(np.float32))
        gt_normals.append(normal.astype(np.float32))
        pairs.append((v, [(sv, 100.0) for sv in range(num_views) if sv != v]))

    formats.write_pair_txt(folder / "pair.txt", pairs)
    return SyntheticScene(folder=folder, gt_depths=gt_depths,
                          gt_normals=gt_normals, Ks=Ks, Rs=Rs, ts=ts)
