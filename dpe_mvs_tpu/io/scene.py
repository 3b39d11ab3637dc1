"""Scene loading: the directory-tree-as-database layer (reference L1).

Mirrors the data contract of ``DPE::InuputInitialization`` (DPE.cpp:733-914)
and ``GenerateSampleList`` (main.cpp:264-308): ``images/%08d.jpg``,
``cams/%08d_cam.txt``, ``pair.txt``, optional ``blocks/mask_<id>.jpg``.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from . import formats


@dataclasses.dataclass
class Problem:
    """One reference view and its source set (reference ``Problem``,
    main.h:108-118)."""

    index: int
    ref_image_id: int
    src_image_ids: List[int]
    dense_folder: Path
    scale_size: int = 1
    show_medium_result: bool = False
    iteration: int = 0

    @property
    def result_folder(self) -> Path:
        return formats.result_folder(self.dense_folder, self.ref_image_id)


def generate_sample_list(dense_folder, viz: bool = False) -> List[Problem]:
    """Build the problem list from ``pair.txt``; source views with score <= 0
    are dropped (main.cpp:297-305)."""
    dense_folder = Path(dense_folder)
    pairs = formats.read_pair_txt(dense_folder / "pair.txt")
    problems = []
    for i, (ref_id, srcs) in enumerate(pairs):
        src_ids = [sid for sid, score in srcs if score > 0.0]
        p = Problem(index=i, ref_image_id=ref_id, src_image_ids=src_ids,
                    dense_folder=dense_folder, show_medium_result=viz)
        p.result_folder.mkdir(parents=True, exist_ok=True)
        problems.append(p)
    return problems


def check_images(problems: List[Problem]) -> bool:
    """All reference images must share one size (main.cpp:310-329)."""
    if not problems:
        return False
    size = None
    for p in problems:
        img = load_image_gray(p.dense_folder, p.ref_image_id)
        if img is None:
            return False
        if size is None:
            size = img.shape
        elif img.shape != size:
            return False
    return True


def image_path(dense_folder, image_id: int) -> Path:
    return Path(dense_folder) / "images" / f"{image_id:08d}.jpg"


def cam_path(dense_folder, image_id: int) -> Path:
    return Path(dense_folder) / "cams" / f"{image_id:08d}_cam.txt"


def load_image_gray(dense_folder, image_id: int) -> Optional[np.ndarray]:
    """Grayscale float32 image in [0, 255] (DPE.cpp:744-748)."""
    img = cv2.imread(str(image_path(dense_folder, image_id)), cv2.IMREAD_GRAYSCALE)
    if img is None:
        return None
    return img.astype(np.float32)


def load_image_color(dense_folder, image_id: int) -> Optional[np.ndarray]:
    """BGR uint8 image (fusion reads color, DPE.cpp:1253)."""
    return cv2.imread(str(image_path(dense_folder, image_id)), cv2.IMREAD_COLOR)


@dataclasses.dataclass
class CameraData:
    K: np.ndarray  # (3,3) float32
    R: np.ndarray  # (3,3) float32
    t: np.ndarray  # (3,)  float32
    depth_min: float
    depth_max: float
    width: int = 0
    height: int = 0

    def scaled(self, scale_x: float, scale_y: float,
               width: int, height: int) -> "CameraData":
        K = self.K.copy()
        K[0, 0] *= scale_x
        K[0, 2] *= scale_x
        K[1, 1] *= scale_y
        K[1, 2] *= scale_y
        return dataclasses.replace(self, K=K, width=width, height=height)


def load_camera(dense_folder, image_id: int) -> CameraData:
    K, R, t, dmin, dmax = formats.read_cam_txt(cam_path(dense_folder, image_id))
    return CameraData(K=K, R=R, t=t, depth_min=dmin, depth_max=dmax)


def resize_linear(img: np.ndarray, new_cols: int, new_rows: int) -> np.ndarray:
    return cv2.resize(img, (new_cols, new_rows), interpolation=cv2.INTER_LINEAR)


def scaled_size(cols: int, rows: int, scale_size: int) -> Tuple[int, int]:
    """Round-to-nearest scaled size (DPE.cpp:800-802)."""
    factor = 1.0 / float(scale_size)
    return int(round(cols * factor)), int(round(rows * factor))


def rescale_nearest(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour rescale used for priors between rounds
    (``RescaleMatToTargetSize``, DPE.cpp:1146-1168). The reference swaps
    scale_x/scale_y in the index math, which is harmless for uniform scaling;
    we implement the intended mapping."""
    if src.shape[1] == width and src.shape[0] == height:
        return src
    r_idx = np.minimum(
        (np.arange(height) * (src.shape[0] / height)).astype(np.int64),
        src.shape[0] - 1,
    )
    c_idx = np.minimum(
        (np.arange(width) * (src.shape[1] / width)).astype(np.int64),
        src.shape[1] - 1,
    )
    return src[np.ix_(r_idx, c_idx)]


@dataclasses.dataclass
class ProblemInputs:
    """Everything one PatchMatch sweep needs for a problem, already scaled.

    Host-side analogue of the upload half of ``DPE::InuputInitialization`` /
    ``CudaSpaceInitialization``: images (1 ref + S src), cameras, depth range,
    optional priors and source depths.
    """

    images: np.ndarray               # (1+S, H, W) float32
    cameras: List[CameraData]        # len 1+S, scaled to (H, W)
    depth_min: float                 # cameras[0].depth_min * 0.6 (DPE.cpp:788)
    depth_max: float                 # cameras[0].depth_max * 1.2 (DPE.cpp:789)
    width: int
    height: int
    prior_depth: Optional[np.ndarray] = None        # (H, W) f32
    prior_normal: Optional[np.ndarray] = None       # (H, W, 3) f32 world-frame
    prior_selected_views: Optional[np.ndarray] = None  # (H, W) int32 bitmask
    weak_info: Optional[np.ndarray] = None          # (H, W) uint8 PixelState
    src_depths: Optional[np.ndarray] = None         # (1+S, H, W) f32 for geom


def load_problem_inputs(
    problem: Problem,
    scale_size: int,
    *,
    need_prior: bool,
    need_weak: bool,
    need_src_depths: bool,
) -> ProblemInputs:
    """Load and scale one problem's inputs (DPE.cpp:733-914)."""
    dense = problem.dense_folder
    ids = [problem.ref_image_id] + list(problem.src_image_ids)
    imgs = []
    cams = []
    for iid in ids:
        img = load_image_gray(dense, iid)
        cam = load_camera(dense, iid)
        if scale_size != 1:
            new_cols, new_rows = scaled_size(img.shape[1], img.shape[0], scale_size)
            sx = new_cols / img.shape[1]
            sy = new_rows / img.shape[0]
            img = resize_linear(img, new_cols, new_rows)
            cam = cam.scaled(sx, sy, new_cols, new_rows)
        else:
            cam = dataclasses.replace(cam, width=img.shape[1], height=img.shape[0])
        imgs.append(img)
        cams.append(cam)
    height, width = imgs[0].shape
    out = ProblemInputs(
        images=np.stack(imgs, axis=0),
        cameras=cams,
        depth_min=cams[0].depth_min * 0.6,
        depth_max=cams[0].depth_max * 1.2,
        width=width,
        height=height,
    )

    rf = problem.result_folder
    if need_prior:
        depth = formats.read_dmb(rf / "depths.dmb").astype(np.float32)
        normal = formats.read_dmb(rf / "normals.dmb").astype(np.float32)
        sel = formats.read_dmb(rf / "selected_views.bin").astype(np.int32)
        out.prior_depth = rescale_nearest(depth, width, height)
        out.prior_normal = rescale_nearest(normal, width, height)
        out.prior_selected_views = rescale_nearest(sel, width, height)

    if need_weak:
        weak = formats.read_dmb(rf / "weak.bin").astype(np.uint8)
        out.weak_info = rescale_nearest(weak, width, height)

    if need_src_depths:
        depths = []
        for iid in ids:
            p = formats.result_folder(dense, iid) / "depths.dmb"
            if p.exists():
                d = formats.read_dmb(p).astype(np.float32)
            else:
                d = np.zeros((height, width), np.float32)
            depths.append(rescale_nearest(d, width, height))
        out.src_depths = np.stack(depths, axis=0)

    return out
