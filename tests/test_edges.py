"""Dual-level edge extraction tests (reference C9 semantics)."""
import numpy as np

from dpe_mvs_tpu.edges import dual_level


def test_roberts_flat_is_dark():
    img = np.full((20, 20), 100, np.uint8)
    r = dual_level.roberts(img)
    # Borders forced to sqrt(50^2+50^2)=70 (DPE.cpp:18-19); interior 0.
    assert (r[1:-1, 1:-1] == 0).all()
    assert (r[0, :] == 70).all()


def test_roberts_detects_step():
    img = np.zeros((20, 20), np.uint8)
    img[:, 10:] = 100
    r = dual_level.roberts(img)
    # sqrt(100^2 + 100^2) = 141 at the step column.
    assert r[5, 9] > 100
    assert r[5, 3] == 0


def test_roberts_truncation_wraps_like_reference():
    """(uchar)sqrt(t1^2+t2^2) wraps >255 magnitudes (C-style truncation);
    both the native and NumPy paths must agree."""
    img = np.zeros((8, 8), np.uint8)
    img[:, 4:] = 200
    r = dual_level.roberts(img)
    assert r[3, 3] == int(np.sqrt(2) * 200) % 256


def test_connect_labels_regions():
    binary = np.zeros((10, 10), np.uint8)
    binary[:, 5] = 255  # wall splits the zero area in two
    labels, counts = dual_level.connect(binary)
    assert labels[0, 5] == 0
    left = labels[3, 2]
    right = labels[3, 8]
    assert left != 0 and right != 0 and left != right
    assert counts[left] == 50
    assert counts[right] == 40


def test_fine_edges_on_step(rng):
    img = (rng.random((64, 64)) * 20).astype(np.uint8)
    img[:, 32:] += 150
    edges = dual_level.fine_edges(img, high_res_img=True)
    assert set(np.unique(edges)) <= {0, 255}
    # The vertical step must be detected somewhere near column 32.
    assert edges[:, 30:35].max() == 255


def test_coarse_labels_weak_region(rng):
    # Large flat region + textured region.
    img = (rng.random((128, 128)) * 255).astype(np.uint8)
    img[:, :64] = 120  # flat half -> one big weak-texture region
    labels = dual_level.coarse_labels(img, scale=0, high_res_img=False)
    assert labels.shape == (128, 128)
    # Flat half contains a large positive-label region.
    left = labels[10:110, 5:55]
    pos = left[left > 0]
    assert pos.size > left.size * 0.5
    # Most of the textured half is edge (0) or tiny (-1) regions.
    right = labels[10:110, 70:120]
    assert (right <= 0).mean() > 0.5
