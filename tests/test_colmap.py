"""COLMAP converter tests on a synthetic sparse model."""
import numpy as np
import cv2
import pytest

from dpe_mvs_tpu.io import colmap, formats


def make_colmap_scene(folder, n_images=3, n_points=60, seed=0):
    rng = np.random.default_rng(seed)
    (folder / "images").mkdir(parents=True)
    model = folder / "sparse" / "0"
    model.mkdir(parents=True)

    W, H, f = 64, 48, 60.0
    pts = np.stack([rng.uniform(-1, 1, n_points), rng.uniform(-1, 1, n_points),
                    rng.uniform(4, 6, n_points)], -1)

    with open(model / "cameras.txt", "w") as fh:
        fh.write("# cameras\n")
        fh.write(f"1 PINHOLE {W} {H} {f} {f} {W/2} {H/2}\n")

    img_lines = ["# images"]
    for i in range(n_images):
        t = np.array([0.3 * i, 0.0, 0.0])
        q = np.array([1.0, 0, 0, 0])
        obs = []
        for pid in range(n_points):
            Xc = pts[pid] + t
            u = f * Xc[0] / Xc[2] + W / 2
            v = f * Xc[1] / Xc[2] + H / 2
            obs.append(f"{u} {v} {pid + 1}")
        img_lines.append(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                         f"{t[0]} {t[1]} {t[2]} 1 im{i}.png")
        img_lines.append(" ".join(obs))
    (model / "images.txt").write_text("\n".join(img_lines) + "\n")

    with open(model / "points3D.txt", "w") as fh:
        fh.write("# points\n")
        for pid in range(n_points):
            fh.write(f"{pid + 1} {pts[pid, 0]} {pts[pid, 1]} {pts[pid, 2]} "
                     f"10 20 30 0.5 0 0\n")

    for i in range(n_images):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(folder / "images" / f"im{i}.png"), img)
    return folder


def test_colmap_to_dpe(tmp_path):
    src = make_colmap_scene(tmp_path / "colmap")
    out = tmp_path / "dpe"
    colmap.colmap_to_dpe(src, out)

    pairs = formats.read_pair_txt(out / "pair.txt")
    assert len(pairs) == 3
    # All views share all points -> every pair scored > 0 (baselines large
    # enough for > 1 deg triangulation).
    assert all(len(srcs) == 2 for _, srcs in pairs)
    assert all(s > 0 for _, srcs in pairs for _, s in srcs)

    K, R, t, dmin, dmax = formats.read_cam_txt(out / "cams" / "00000000_cam.txt")
    assert dmin > 0 and dmax > dmin
    # z range is [4, 6]; relaxed bounds 0.75x / 1.25x.
    assert 2.0 < dmin < 5.0
    assert 5.0 < dmax < 9.0
    np.testing.assert_allclose(K[0, 0], 60.0)

    img = cv2.imread(str(out / "images" / "00000000.jpg"))
    assert img.shape == (48, 64, 3)


def test_qvec_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_bin_roundtrip(tmp_path, rng):
    """Binary COLMAP reader against files we synthesize in the bin format."""
    import struct
    p = tmp_path / "cameras.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 7, 1, 100, 80))  # PINHOLE
        f.write(struct.pack("<dddd", 50.0, 51.0, 50.0, 40.0))
    cams = colmap.read_cameras_bin(p)
    assert cams[7].model == "PINHOLE"
    assert cams[7].width == 100
    np.testing.assert_allclose(cams[7].params, [50.0, 51.0, 50.0, 40.0])
