"""Round-trip and bit-compat tests for scene binary formats (reference C10)."""
import numpy as np
import pytest

from dpe_mvs_tpu.io import formats


def test_dmb_roundtrip_f32(tmp_path, rng):
    arr = rng.normal(size=(7, 9)).astype(np.float32)
    p = tmp_path / "a.dmb"
    formats.write_dmb(p, arr)
    back = formats.read_dmb(p)
    np.testing.assert_array_equal(back, arr)


def test_dmb_roundtrip_3ch(tmp_path, rng):
    arr = rng.normal(size=(5, 4, 3)).astype(np.float32)
    p = tmp_path / "n.dmb"
    formats.write_dmb(p, arr)
    np.testing.assert_array_equal(formats.read_dmb(p), arr)


def test_dmb_roundtrip_u8_i32(tmp_path, rng):
    for dt in (np.uint8, np.int32):
        arr = rng.integers(0, 100, size=(6, 6)).astype(dt)
        p = tmp_path / f"{dt.__name__}.dmb"
        formats.write_dmb(p, arr)
        back = formats.read_dmb(p)
        assert back.dtype == dt
        np.testing.assert_array_equal(back, arr)


def test_dmb_header_layout(tmp_path):
    """Header must be {version=1, rows, cols, cvtype} int32 LE (DPE.cpp:320)."""
    arr = np.zeros((3, 5), np.float32)
    p = tmp_path / "h.dmb"
    formats.write_dmb(p, arr)
    raw = p.read_bytes()
    hdr = np.frombuffer(raw[:16], np.int32)
    assert list(hdr) == [1, 3, 5, 5]  # CV_32FC1 == 5
    n3 = np.zeros((3, 5, 3), np.float32)
    formats.write_dmb(p, n3)
    hdr = np.frombuffer(p.read_bytes()[:16], np.int32)
    assert list(hdr) == [1, 3, 5, 5 + (2 << 3)]  # CV_32FC3 == 21


def test_cam_txt_roundtrip(tmp_path, rng):
    K = np.array([[700.0, 0, 320], [0, 710, 240], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.5, -0.2, 1.0], np.float32)
    p = tmp_path / "00000000_cam.txt"
    formats.write_cam_txt(p, K, R, t, 2.0, 0.01, 192, 10.0)
    K2, R2, t2, dmin, dmax = formats.read_cam_txt(p)
    np.testing.assert_allclose(K2, K, rtol=1e-6)
    np.testing.assert_allclose(R2, R)
    np.testing.assert_allclose(t2, t)
    assert dmin == 2.0 and dmax == 10.0


def test_pair_txt_roundtrip(tmp_path):
    pairs = [(0, [(1, 120.5), (2, 80.0), (3, 0.0)]),
             (1, [(0, 120.5)]),
             (2, [(0, 80.0), (1, 33.3)])]
    p = tmp_path / "pair.txt"
    formats.write_pair_txt(p, pairs)
    back = formats.read_pair_txt(p)
    assert len(back) == 3
    assert back[0][0] == 0
    assert back[0][1] == [(1, 120.5), (2, 80.0), (3, 0.0)]


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    cols = rng.integers(0, 255, size=(17, 3)).astype(np.uint8)
    p = tmp_path / "c.ply"
    formats.write_ply(p, pts, cols)
    pts2, cols2 = formats.read_ply(p)
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)
    header = p.read_bytes()[:200].decode("ascii", "ignore")
    assert "binary_little_endian" in header
    assert "diffuse_blue" in header  # reference stores BGR (DPE.cpp:545-547)
