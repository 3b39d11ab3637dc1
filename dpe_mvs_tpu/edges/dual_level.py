"""Dual-level edge extraction (reference component C9).

Re-implementation of ``Roberts`` / ``Connect`` / ``EdgeSegment``
(DPE.cpp:9-291) with vectorized NumPy + OpenCV primitives:

  - *fine* edges: auto-threshold Canny — thresholds from the image median with
    sigma 0.67 (DPE.cpp:192-221);
  - *coarse* "labels": downsample, Roberts gradient + threshold, connected
    components of the non-edge area, Hough-line completion of large
    weak-texture regions' boundaries, then relabel at the processing scale
    with small regions marked -1 (DPE.cpp:140-190, 224-288).

This stage is <1% of runtime and cached per scale on disk, so it stays
host-side (SURVEY.md §7.1); the maps it produces feed the TPU kernels.
"""
from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np
from scipy import ndimage

_FOUR_CONN = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.int32)


def roberts(src: np.ndarray) -> np.ndarray:
    """Roberts cross gradient magnitude; borders forced to (50,50)
    (DPE.cpp:9-25). src: uint8 (H, W). Returns uint8."""
    from .. import native
    nat = native.get()
    if nat is not None:
        return nat.roberts(np.ascontiguousarray(src, np.uint8))
    s = src.astype(np.int32)
    t1 = np.full(s.shape, 50, np.int32)
    t2 = np.full(s.shape, 50, np.int32)
    t1[1:-1, 1:-1] = s[1:-1, 1:-1] - s[2:, 2:][: s.shape[0] - 2, : s.shape[1] - 2]
    t2[1:-1, 1:-1] = s[2:, 1:-1][: s.shape[0] - 2, :] - s[1:-1, 2:][:, : s.shape[1] - 2]
    mag = np.sqrt(t1.astype(np.float64) ** 2 + t2.astype(np.float64) ** 2)
    return mag.astype(np.uint8)  # C-style truncation like (uchar)sqrt(...)


def connect(binary: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """4-connected components of the *zero* pixels (``Connect``,
    DPE.cpp:28-134). Returns (label_mask int32 with 0 for edge pixels,
    counts per label including label 0)."""
    from .. import native
    nat = native.get()
    if nat is not None:
        labels, counts = nat.connected_components(
            np.ascontiguousarray(binary, np.uint8))
        return labels, counts
    mask = binary == 0
    labels, n = ndimage.label(mask, structure=_FOUR_CONN)
    counts = np.bincount(labels.ravel(), minlength=n + 1)
    return labels.astype(np.int32), counts


def _auto_canny(src_u8: np.ndarray) -> np.ndarray:
    """Median-based auto-threshold Canny (DPE.cpp:192-221)."""
    hist = np.bincount(src_u8.ravel(), minlength=256)
    half = src_u8.size // 2
    csum = np.cumsum(hist[:255])
    above = np.nonzero(csum > half)[0]
    median_val = int(above[0]) if above.size else -1
    sigma = 0.67
    t1 = int((1 - sigma) * median_val)
    t2 = median_val
    return cv2.Canny(src_u8, t1, t2, apertureSize=3, L2gradient=True)


def _smear_borders(dst: np.ndarray) -> np.ndarray:
    """Copy inner-ring zero-ness onto the border (DPE.cpp:239-250): a border
    pixel becomes non-edge if its inward neighbour is non-edge."""
    out = dst.copy()
    out[:, 0][out[:, 1] == 0] = 0
    out[:, -1][out[:, -2] == 0] = 0
    out[0, :][out[1, :] == 0] = 0
    out[-1, :][out[-2, :] == 0] = 0
    return out


def fine_edges(src_img_u8: np.ndarray, high_res_img: bool) -> np.ndarray:
    """Fine edge map at the input resolution: ``EdgeSegment(scale, img, 0,
    use_canny=True, high_res)`` (DPE.cpp:136-253). Returns uint8 {0, 255}."""
    robthr = 4 if high_res_img else 6
    edge = _auto_canny(src_img_u8)
    edge = np.where(edge > robthr, 255, 0).astype(np.uint8)
    return _smear_borders(edge)


def _hough_complete(dst: np.ndarray, weak_tex_num: int) -> np.ndarray:
    """Hough-line completion of large weak regions' boundaries
    (DPE.cpp:150-190). dst: binary uint8 {0,255} at the downsampled scale."""
    h, w = dst.shape
    houthr = int(min(w, h) / 30.0)
    min_line_length = int(min(w, h) / 30.0)
    max_line_gap = int(min(w, h) / 30.0)
    labels, counts = connect(dst)
    out = dst.copy()
    for k in range(1, counts.size):
        if counts[k] < weak_tex_num:
            continue
        region = labels == k
        # Boundary = non-region pixels 4-adjacent to the region.
        dil = ndimage.binary_dilation(region, structure=_FOUR_CONN.astype(bool))
        border = (dil & ~region).astype(np.uint8) * 255
        lines = cv2.HoughLinesP(border, 1, np.pi / 180, max(houthr, 1),
                                minLineLength=min_line_length,
                                maxLineGap=max_line_gap)
        if lines is None:
            continue
        for ln in lines.reshape(-1, 4):
            cv2.line(out, (int(ln[0]), int(ln[1])), (int(ln[2]), int(ln[3])),
                     255, 1)
    return out


def coarse_labels(full_img_u8: np.ndarray, scale: int,
                  high_res_img: bool) -> np.ndarray:
    """Coarse label map at resolution ``full / 2**scale``:
    ``EdgeSegment(scale, full_img, 1, use_canny=False, high_res)``
    (DPE.cpp:136-288). Returns int32: 0 = edge, -1 = small region,
    >0 = weak-texture region id."""
    robthr = 4 if high_res_img else 6
    h, w = full_img_u8.shape
    weak_tex_num = int(1.0 * h * w / (1024 << (2 * scale)))

    src_down = full_img_u8
    if high_res_img:
        src_down = cv2.resize(src_down, (w // 2, h // 2),
                              interpolation=cv2.INTER_LINEAR)
    src_down = cv2.resize(src_down, (src_down.shape[1] // 2,
                                     src_down.shape[0] // 2),
                          interpolation=cv2.INTER_LINEAR)

    dst = roberts(src_down)
    dst = np.where(dst > robthr, 255, 0).astype(np.uint8)
    dst = _hough_complete(dst, weak_tex_num)

    factor = 1.0 / float(1 << scale)
    new_cols = int(round(w * factor))
    new_rows = int(round(h * factor))
    dst = cv2.resize(dst, (new_cols, new_rows), interpolation=cv2.INTER_LINEAR)
    dst = np.where(dst > robthr, 255, 0).astype(np.uint8)
    dst = _smear_borders(dst)

    labels, counts = connect(dst)
    small = counts[labels] <= weak_tex_num
    labels = np.where(small & (labels != 0), -1, labels)
    return labels.astype(np.int32)
