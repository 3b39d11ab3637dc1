"""Device-side state for one PatchMatch problem.

The reference bundles ~25 raw device pointers into ``DataPassHelper``
(DPE.h:52-86). The TPU-native equivalent is two pytrees:

  - :class:`SweepData` — immutable per-sweep inputs (images, cameras, edges);
  - :class:`PMState`  — the mutable per-pixel state a sweep transforms
    (plane hypotheses, costs, view selection, pixel classification).

The source-view axis ``V`` is padded to a static size with a validity mask so
one compiled sweep serves every problem of a scene (XLA needs static shapes;
the reference similarly hard-caps at MAX_IMAGES=32, main.h:39).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PixelState
from ..geometry import cameras as geo
from ..io.scene import ProblemInputs


class SweepData(NamedTuple):
    ref_image: jnp.ndarray     # (H, W) f32 grayscale in [0, 255]
    src_images: jnp.ndarray    # (V, H, W) f32
    ref_cam: geo.Camera        # scalar camera
    src_cams: geo.Camera       # stacked (V, ...) cameras
    R_rel: jnp.ndarray         # (V, 3, 3) ref->src relative rotation
    t_rel: jnp.ndarray         # (V, 3)
    baseline: jnp.ndarray      # (V,) |c_ref - c_src|
    view_valid: jnp.ndarray    # (V,) bool — padding mask
    src_depths: jnp.ndarray    # (V, H, W) f32 (zeros unless geom pass)
    depth_min: jnp.ndarray     # () f32
    depth_max: jnp.ndarray     # () f32
    edge: jnp.ndarray          # (H, W) bool — fine edges at this scale
    edge_low: jnp.ndarray      # (Hl, Wl) bool — low-res edges (Bresenham map)
    label: jnp.ndarray         # (H, W) i32 — coarse region labels
    rect: Optional[tuple] = None  # per-view rectcost.RectView (TPU path)

    @property
    def height(self) -> int:
        return self.ref_image.shape[0]

    @property
    def width(self) -> int:
        return self.ref_image.shape[1]

    @property
    def num_src(self) -> int:
        return self.src_images.shape[0]


class PMState(NamedTuple):
    plane: jnp.ndarray          # (H, W, 4) — (n_cam, dist) during the sweep;
                                # (n_world, depth) at sweep boundaries
    cost: jnp.ndarray           # (H, W) f32
    selected: jnp.ndarray       # (H, W) uint32 view bitmask
    view_weight: jnp.ndarray    # (H, W, V) int32 MC view weights
    weak: jnp.ndarray           # (H, W) uint8 PixelState
    key: jax.Array              # PRNG key


def pad_views(arr: np.ndarray, v_pad: int, fill=0.0) -> np.ndarray:
    """Pad the leading view axis to ``v_pad``."""
    v = arr.shape[0]
    if v == v_pad:
        return arr
    if v > v_pad:
        return arr[:v_pad]
    pad_shape = (v_pad - v,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)], axis=0)


def build_sweep_data(
    inputs: ProblemInputs,
    v_pad: int,
    edge: Optional[np.ndarray] = None,
    edge_low: Optional[np.ndarray] = None,
    label: Optional[np.ndarray] = None,
) -> SweepData:
    """Assemble device inputs from host-side problem inputs."""
    n_src = inputs.images.shape[0] - 1
    H, W = inputs.height, inputs.width

    # All prep math in NumPy: on a remote-compile backend every eager jnp op
    # is a separately-compiled module (10-60s latency each on axon); the
    # device should only ever see final jnp.asarray transfers here.
    ref_c = inputs.cameras[0]
    ref_cam = geo.Camera(
        K=jnp.asarray(ref_c.K), R=jnp.asarray(ref_c.R), t=jnp.asarray(ref_c.t)
    )

    src_K = np.stack([c.K for c in inputs.cameras[1:]]) if n_src else np.zeros((0, 3, 3), np.float32)
    src_R = np.stack([c.R for c in inputs.cameras[1:]]) if n_src else np.zeros((0, 3, 3), np.float32)
    src_t = np.stack([c.t for c in inputs.cameras[1:]]) if n_src else np.zeros((0, 3), np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (v_pad, 3, 3)).copy()
    src_K = pad_views(src_K, v_pad)
    src_K[n_src:] = np.eye(3, dtype=np.float32)
    src_R = pad_views(src_R, v_pad)
    src_R[n_src:] = eye[n_src:]
    src_t = pad_views(src_t, v_pad)
    src_cams = geo.Camera(K=jnp.asarray(src_K), R=jnp.asarray(src_R), t=jnp.asarray(src_t))

    # R_rel = R_src R_ref^T; t_rel = R_src (c_ref - c_src); c = -R^T t
    # (hoisted from ComputeHomography, DPE.cu:455-481).
    R_ref = np.asarray(ref_c.R, np.float32)
    t_ref = np.asarray(ref_c.t, np.float32)
    center_ref = -R_ref.T @ t_ref
    centers_src = -np.einsum("vij,vi->vj", src_R, src_t)
    R_rel = np.einsum("vik,jk->vij", src_R, R_ref)
    t_rel = np.einsum("vij,vj->vi", src_R, center_ref[None] - centers_src)
    baseline = np.linalg.norm(center_ref[None, :] - centers_src, axis=-1)

    valid = np.zeros((v_pad,), bool)
    valid[:n_src] = True

    src_images = pad_views(inputs.images[1:], v_pad)
    if inputs.src_depths is not None:
        src_depths = pad_views(inputs.src_depths[1:], v_pad)
    else:
        src_depths = np.zeros((v_pad, H, W), np.float32)

    if edge is None:
        edge = np.zeros((H, W), bool)
    if edge_low is None:
        edge_low = np.zeros((max(H // 2, 1), max(W // 2, 1)), bool)
    if label is None:
        label = np.zeros((H, W), np.int32)

    return SweepData(
        ref_image=jnp.asarray(inputs.images[0]),
        src_images=jnp.asarray(src_images),
        ref_cam=ref_cam,
        src_cams=src_cams,
        R_rel=jnp.asarray(R_rel),
        t_rel=jnp.asarray(t_rel),
        baseline=jnp.asarray(baseline, jnp.float32),
        view_valid=jnp.asarray(valid),
        src_depths=jnp.asarray(src_depths),
        depth_min=jnp.float32(inputs.depth_min),
        depth_max=jnp.float32(inputs.depth_max),
        edge=jnp.asarray(edge.astype(bool)),
        edge_low=jnp.asarray(edge_low.astype(bool)),
        label=jnp.asarray(label.astype(np.int32)),
    )


def init_pm_state(
    inputs: ProblemInputs, v_pad: int, key, use_APD: bool
) -> PMState:
    """Initial per-pixel state from priors (DPE.cpp:846-912).

    ``plane`` is filled with (world normal, depth) when priors exist — the
    sweep's init stage re-frames it into camera coordinates
    (``RandomInitialization`` REFINE path, DPE.cu:1054-1062).
    """
    H, W = inputs.height, inputs.width
    plane = np.zeros((H, W, 4), np.float32)
    if inputs.prior_depth is not None:
        plane[..., 3] = inputs.prior_depth
        plane[..., :3] = inputs.prior_normal
    selected = (
        inputs.prior_selected_views.astype(np.uint32)
        if inputs.prior_selected_views is not None
        else np.zeros((H, W), np.uint32)
    )
    if use_APD and inputs.weak_info is not None:
        weak = inputs.weak_info.astype(np.uint8)
    else:
        weak = np.full((H, W), int(PixelState.STRONG), np.uint8)
    return PMState(
        plane=jnp.asarray(plane),
        cost=jnp.full((H, W), 2.0, jnp.float32),
        selected=jnp.asarray(selected),
        view_weight=jnp.zeros((H, W, v_pad), jnp.int32),
        weak=jnp.asarray(weak),
        key=key,
    )
