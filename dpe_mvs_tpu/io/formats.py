"""Binary scene formats, bit-compatible with the reference tool chain.

Covers component C10 of the reference inventory:
  - ``.dmb`` little-endian mat container (``ReadBinMat``/``WriteBinMat``,
    DPE.cpp:293-339)
  - ``*_cam.txt`` camera files (``ReadCamera``, DPE.cpp:341-382)
  - ``pair.txt`` view-selection lists (``GenerateSampleList``, main.cpp:264-308)
  - ``.npy`` exports (``WriteMatToNpy`` + per-output converters,
    main.cpp:48-260) — here plain ``np.save``, which emits the same format
  - binary little-endian ``.ply`` point clouds with the reference's
    BGR ``diffuse_*`` fields (``ExportPointCloud``, DPE.cpp:532-572)

Pure NumPy; no OpenCV dependency for the container formats.
"""
from __future__ import annotations

import os
import struct
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

# OpenCV type codes used by the reference (CV_8U=0, CV_8S=1, CV_32S=4, CV_32F=5
# with channels packed as depth + (channels-1)*8).
_CV_DEPTH_TO_DTYPE = {0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
                      4: np.int32, 5: np.float32, 6: np.float64}
_DTYPE_TO_CV_DEPTH = {np.dtype(v): k for k, v in _CV_DEPTH_TO_DTYPE.items()}


def cv_type(depth: int, channels: int) -> int:
    return depth + ((channels - 1) << 3)


def read_dmb(path: os.PathLike) -> np.ndarray:
    """Read a ``.dmb`` mat: header {version=1, rows, cols, cvtype} + raw data
    (DPE.cpp:293-318). Returns (rows, cols) or (rows, cols, ch) ndarray."""
    with open(path, "rb") as f:
        version, rows, cols, type_ = struct.unpack("<iiii", f.read(16))
        if version != 1:
            raise ValueError(f"dmb version {version} != 1 in {path}")
        depth = type_ & 7
        channels = (type_ >> 3) + 1
        dtype = np.dtype(_CV_DEPTH_TO_DTYPE[depth])
        data = np.fromfile(f, dtype=dtype, count=rows * cols * channels)
    arr = data.reshape(rows, cols, channels)
    return arr[..., 0] if channels == 1 else arr


def write_dmb(path: os.PathLike, arr: np.ndarray) -> None:
    """Write a ``.dmb`` mat (DPE.cpp:320-339)."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim == 2:
        rows, cols, channels = arr.shape[0], arr.shape[1], 1
    elif arr.ndim == 3:
        rows, cols, channels = arr.shape
    else:
        raise ValueError(f"dmb arrays must be 2D/3D, got shape {arr.shape}")
    depth = _DTYPE_TO_CV_DEPTH[arr.dtype]
    with open(path, "wb") as f:
        f.write(struct.pack("<iiii", 1, rows, cols, cv_type(depth, channels)))
        arr.tofile(f)


def read_cam_txt(path: os.PathLike) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                             float, float]:
    """Parse a ``%08d_cam.txt``: extrinsic 4x4, intrinsic 3x3 and the depth
    line ``depth_min interval depth_num depth_max`` (ReadCamera,
    DPE.cpp:341-382; ETH/TnT variant). Returns (K, R, t, depth_min, depth_max).
    """
    tokens: List[str] = []
    with open(path, "r") as f:
        for line in f:
            tokens.extend(line.split())
    it = iter(tokens)

    def expect(word):
        w = next(it)
        if w != word:
            raise ValueError(f"expected '{word}' in {path}, got '{w}'")

    expect("extrinsic")
    ext = np.array([float(next(it)) for _ in range(16)], np.float32).reshape(4, 4)
    expect("intrinsic")
    K = np.array([float(next(it)) for _ in range(9)], np.float32).reshape(3, 3)
    depth_min = float(next(it))
    _interval = float(next(it))
    rest = [float(x) for x in it]
    # ETH/TnT files carry "min interval num max"; DTU files carry "min interval"
    # (DPE.cpp:369-379). Support both.
    if len(rest) >= 2:
        depth_max = rest[1]
    elif len(rest) == 1:
        depth_max = rest[0]
    else:
        depth_max = depth_min + _interval * 192.0
    R = ext[:3, :3].copy()
    t = ext[:3, 3].copy()
    return K, R, t, depth_min, depth_max


def write_cam_txt(path: os.PathLike, K: np.ndarray, R: np.ndarray, t: np.ndarray,
                  depth_min: float, interval: float, depth_num: float,
                  depth_max: float) -> None:
    """Write a camera file in the layout produced by the reference converter
    (colmap2mvsnet.py:454-466)."""
    ext = np.eye(4, dtype=np.float64)
    ext[:3, :3] = R
    ext[:3, 3] = t
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in ext:
            f.write(" ".join(f"{v}" for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in np.asarray(K):
            f.write(" ".join(f"{v}" for v in row) + "\n")
        f.write(f"\n{depth_min} {interval} {depth_num} {depth_max}\n")


def read_pair_txt(path: os.PathLike) -> List[Tuple[int, List[Tuple[int, float]]]]:
    """Parse ``pair.txt``: count, then per image "ref_id" line and
    "n src_id score ..." line (GenerateSampleList, main.cpp:264-308)."""
    with open(path, "r") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n = int(lines[0].split()[0])
    out = []
    idx = 1
    for _ in range(n):
        ref_id = int(lines[idx].split()[0])
        parts = lines[idx + 1].split()
        n_src = int(parts[0])
        srcs = []
        for j in range(n_src):
            srcs.append((int(parts[1 + 2 * j]), float(parts[2 + 2 * j])))
        out.append((ref_id, srcs))
        idx += 2
    return out


def write_pair_txt(path: os.PathLike,
                   pairs: Sequence[Tuple[int, Sequence[Tuple[int, float]]]]) -> None:
    with open(path, "w") as f:
        f.write(f"{len(pairs)}\n")
        for ref_id, srcs in pairs:
            f.write(f"{ref_id}\n{len(srcs)} ")
            f.write(" ".join(f"{i} {s}" for i, s in srcs) + "\n")


def write_ply(path: os.PathLike, points: np.ndarray, colors_bgr: np.ndarray) -> None:
    """Binary little-endian PLY with the reference's vertex layout: float xyz +
    uchar diffuse_blue/green/red (ExportPointCloud, DPE.cpp:532-572)."""
    points = np.ascontiguousarray(points, np.float32)
    colors_bgr = np.ascontiguousarray(colors_bgr, np.uint8)
    from .. import native
    nat = native.get()
    if nat is not None:
        nat.write_ply(str(path), points, colors_bgr)
        return
    n = points.shape[0]
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        "property uchar diffuse_blue\n"
        "property uchar diffuse_green\n"
        "property uchar diffuse_red\n"
        "end_header\n"
    )
    rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("bgr", np.uint8, 3)])
    rec["xyz"] = points
    rec["bgr"] = colors_bgr
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)


def read_ply(path: os.PathLike) -> Tuple[np.ndarray, np.ndarray]:
    """Read a PLY written by :func:`write_ply` (or the reference binary)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int([ln for ln in header.decode().splitlines()
                 if ln.startswith("element vertex")][0].split()[-1])
        rec = np.fromfile(f, dtype=[("xyz", np.float32, 3), ("bgr", np.uint8, 3)],
                          count=n)
    return rec["xyz"].copy(), rec["bgr"].copy()


def result_folder(dense_folder: os.PathLike, image_id: int) -> Path:
    """``<dense>/DPE/<%08d>`` per-view output folder (main.cpp:289)."""
    return Path(dense_folder) / "DPE" / f"{image_id:08d}"
