"""Visualization dumps (reference C11: ShowDepthMap / ShowNormalMap /
ShowWeakImage / ShowEdgeImage, DPE.cpp:384-530)."""
from __future__ import annotations

import cv2
import numpy as np

from ..config import PixelState


def depth_to_color(depth: np.ndarray, depth_min: float, depth_max: float
                   ) -> np.ndarray:
    """Jet-style BGR colormap of a depth map (ShowDepthMap, DPE.cpp:384-448)."""
    delta = max(depth_max - depth_min, 1e-12)
    valid = np.isfinite(depth) & (depth >= depth_min) & (depth <= depth_max)
    v = np.clip((depth_max - depth) / delta, 0.0, 1.0) * 255.0
    img = np.zeros((*depth.shape, 3), np.uint8)
    b = np.zeros_like(v)
    g = np.zeros_like(v)
    r = np.zeros_like(v)
    m = v <= 51
    b[m] = 255
    g[m] = v[m] * 5
    m = (v > 51) & (v <= 102)
    b[m] = 255 - (v[m] - 51) * 5
    g[m] = 255
    m = (v > 102) & (v <= 153)
    g[m] = 255
    r[m] = (v[m] - 102) * 5
    m = (v > 153) & (v <= 204)
    g[m] = 255 - np.uint8((v[m] - 153) * 128.0 / 51 + 0.5)
    r[m] = 255
    m = v > 204
    g[m] = 127 - np.uint8((v[m] - 204) * 127.0 / 51 + 0.5)
    r[m] = 255
    img[..., 0] = np.where(valid, b, 0).astype(np.uint8)
    img[..., 1] = np.where(valid, g, 0).astype(np.uint8)
    img[..., 2] = np.where(valid, r, 0).astype(np.uint8)
    return img


def save_depth_map(path, depth, depth_min, depth_max) -> None:
    cv2.imwrite(str(path), depth_to_color(depth, depth_min, depth_max))


def save_normal_map(path, normal: np.ndarray) -> None:
    """ShowNormalMap (DPE.cpp:450-473)."""
    norm = np.linalg.norm(normal, axis=-1, keepdims=True)
    n = np.where(norm > 0, normal / np.maximum(norm, 1e-12), 0.0)
    img = np.clip(n * 127.5 + 127.5, 0, 255).astype(np.uint8)
    cv2.imwrite(str(path), img)


def save_weak_map(path, weak: np.ndarray) -> None:
    """ShowWeakImage (DPE.cpp:475-502): WEAK white, STRONG green, UNKNOWN red."""
    img = np.zeros((*weak.shape, 3), np.uint8)
    img[weak == int(PixelState.WEAK)] = (255, 255, 255)
    img[weak == int(PixelState.STRONG)] = (0, 255, 0)
    img[weak == int(PixelState.UNKNOWN)] = (0, 0, 255)
    cv2.imwrite(str(path), img)


def save_edge_map(path, edge: np.ndarray) -> None:
    """ShowEdgeImage (DPE.cpp:504-530)."""
    img = np.zeros((*edge.shape, 3), np.uint8)
    img[edge > 0] = (255, 255, 255)
    cv2.imwrite(str(path), img)
