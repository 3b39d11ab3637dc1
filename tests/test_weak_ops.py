"""Unit tests for the weak-pixel machinery: anchor search + plane fit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, PixelState, RunState
from dpe_mvs_tpu.engine import patchmatch as pm
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.sweep import build_support
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.ops import anchors as anchors_mod
from dpe_mvs_tpu.ops import support as sup_ops
from dpe_mvs_tpu.ops import weak as weak_ops
from dpe_mvs_tpu.utils.synthetic import make_plane_scene

WEAK = int(PixelState.WEAK)
STRONG = int(PixelState.STRONG)


@pytest.fixture(scope="module")
def weak_setup(tmp_path_factory):
    folder = tmp_path_factory.mktemp("weak")
    sc = make_plane_scene(folder, width=96, height=72, num_views=3, seed=9)
    p = scene_mod.generate_sample_list(sc.folder)[0]
    inputs = scene_mod.load_problem_inputs(
        p, 1, need_prior=False, need_weak=False, need_src_depths=False)
    H, W = inputs.height, inputs.width
    # Fabricate a weak band with ground-truth priors everywhere else.
    weak = np.full((H, W), STRONG, np.uint8)
    weak[28:44, 24:72] = WEAK
    inputs.weak_info = weak
    inputs.prior_depth = sc.gt_depths[0].copy()
    inputs.prior_normal = sc.gt_normals[0].copy()
    inputs.prior_selected_views = np.full((H, W), 3, np.int32)
    data = st_mod.build_sweep_data(inputs, 2)
    params = PatchMatchParams(
        state=RunState.REFINE_INIT, use_APD=True, use_edge=True,
        use_limit=True, use_label=True, rotate_time=2,
        geom_consistency=False)
    st = st_mod.init_pm_state(inputs, 2, jax.random.key(0), True)
    return sc, data, st, params


def test_gen_neighbours_finds_strong_anchors(weak_setup):
    sc, data, st, params = weak_setup
    sup, st2 = jax.jit(
        lambda d, s: build_support(d, s, params, jax.random.key(1)),
    )(data, st)
    nbs = np.asarray(sup.neighbours)          # (8, H, W, 2)
    weak_mask = np.asarray(st.weak) == WEAK
    yc, xc = 36, 48                            # center of the weak band
    assert weak_mask[yc, xc]
    anchors_xy = nbs[:, yc, xc]               # (8, 2)
    valid = anchors_xy[:, 0] >= 0
    assert valid.sum() >= 4, anchors_xy
    # All valid anchors are STRONG pixels outside the weak band.
    w = np.asarray(st.weak)
    for ax, ay in anchors_xy[valid]:
        assert w[ay, ax] == STRONG
    # Weak pixels with anchors stay weak (reliable) in the returned map.
    assert np.asarray(st2.weak)[yc, xc] == WEAK


def test_fit_plane_matches_gt(weak_setup):
    """With ground-truth strong planes, the RANSAC fit plane at a weak pixel
    must reproduce the true depth closely."""
    sc, data, st, params = weak_setup

    def run(d, s):
        sup, s2 = build_support(d, s, params, jax.random.key(1))
        s2 = pm.initialize(d, s2, params)     # re-frames prior to cam coords
        out = weak_ops.fit_plane_ransac(jax.random.key(2), d, sup, s2, params)
        return out["fit_plane"], out["radius"], s2

    fit_plane, radius, s2 = jax.jit(run)(data, st)
    from dpe_mvs_tpu.geometry import cameras as geo
    H, W = data.ref_image.shape
    px, py = geo.pixel_grid(H, W)
    d_fit = np.asarray(geo.depth_from_plane(data.ref_cam, fit_plane, px, py))
    gt = sc.gt_depths[0]
    band = np.zeros((H, W), bool)
    band[30:42, 28:68] = True
    nonzero = np.asarray(jnp.any(fit_plane[..., :3] != 0, -1)) & band
    assert nonzero.mean() > 0.0, "no fitted planes in the weak band"
    err = np.abs(d_fit - gt) / gt
    assert np.median(err[nonzero]) < 0.02


def test_sector_rays_cover_circle():
    for rt in (1, 2, 4):
        rays = anchors_mod.sector_rays(rt)
        assert rays.shape == (8 * rt, 2)
        ang = np.sort(np.mod(np.arctan2(rays[:, 1], rays[:, 0]), 2 * np.pi))
        gaps = np.diff(np.concatenate([ang, [ang[0] + 2 * np.pi]]))
        assert gaps.max() < 2 * np.pi / (8 * rt) * 2.5
