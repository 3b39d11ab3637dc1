"""Rectified cost engine vs the XLA-gather reference path (CPU interpret).

The rect path evaluates the same bilateral-NCC semantics in per-pair
rectified frames; windows are rotated relative to the original frame and
field transport is nearest-quantized, so parity is statistical, not
bitwise: the true plane must score near zero, wrong planes high, and the
cost field must track the reference implementation closely."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpe_mvs_tpu.config import COST_MAX, PatchMatchParams, schedule_params
from dpe_mvs_tpu.engine import patchmatch as pm
from dpe_mvs_tpu.engine import rectcost
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.geometry import cameras as geo
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    folder = tmp_path_factory.mktemp("rectcost_scene")
    sc = make_plane_scene(folder, width=96, height=72, num_views=4, seed=5)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = 3
    data = st_mod.build_sweep_data(inputs, v_pad)
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views = rectcost.build_rect_views(rh, inputs.images, None,
                                      cameras=inputs.cameras, interpret=True)
    return sc, inputs, data, rh, views, v_pad


def _gt_plane_field(sc, inputs):
    """Ground-truth (n_cam, d) plane field on the ref grid."""
    H, W = inputs.height, inputs.width
    depth = sc.gt_depths[0]
    n_world = sc.gt_normals[0]
    cam = geo.Camera(K=jnp.asarray(inputs.cameras[0].K),
                     R=jnp.asarray(inputs.cameras[0].R),
                     t=jnp.asarray(inputs.cameras[0].t))
    n_cam = geo.normal_world_to_cam(cam, jnp.asarray(n_world))
    px, py = geo.pixel_grid(H, W)
    return cam, np.asarray(geo.plane_from_depth_normal(
        cam, px, py, jnp.asarray(depth), n_cam))


def test_true_plane_scores_low_and_wrong_plane_high(scene):
    sc, inputs, data, rh, views, v_pad = scene
    params = schedule_params(PatchMatchParams(), 0, None)
    offs = pm.strong_offsets(params)
    cam, plane_gt = _gt_plane_field(sc, inputs)

    costs = np.asarray(rectcost.rect_cost_vector(
        views, rh.statics, jnp.asarray(plane_gt), data.view_valid,
        params, offs, interpret=True))
    assert costs.shape == (v_pad, inputs.height, inputs.width)

    # Interior pixels with valid views: the true plane must match well.
    interior = np.zeros(costs.shape[1:], bool)
    interior[8:-8, 8:-8] = True
    c0 = costs[0][interior]
    valid = c0 < COST_MAX
    assert valid.mean() > 0.9
    assert np.median(c0[valid]) < 0.1, float(np.median(c0[valid]))

    # A wrong (shifted-depth) plane must cost much more.
    plane_wrong = plane_gt.copy()
    plane_wrong[..., 3] *= 0.7
    costs_w = np.asarray(rectcost.rect_cost_vector(
        views, rh.statics, jnp.asarray(plane_wrong), data.view_valid,
        params, offs, interpret=True))
    cw = costs_w[0][interior]
    assert np.median(cw[cw < COST_MAX]) > 5 * np.median(c0[valid])


def test_rect_cost_tracks_reference_path(scene):
    sc, inputs, data, rh, views, v_pad = scene
    params = schedule_params(PatchMatchParams(), 0, None)
    offs = pm.strong_offsets(params)
    cam, plane_gt = _gt_plane_field(sc, inputs)

    rng = np.random.default_rng(0)
    # A plausible but imperfect plane field (noisy depths).
    plane = plane_gt.copy()
    plane[..., 3] *= (1.0 + 0.01 * rng.standard_normal(plane.shape[:2]))

    rect_c = np.asarray(rectcost.rect_cost_vector(
        views, rh.statics, jnp.asarray(plane), data.view_valid,
        params, offs, interpret=True))
    ref_c = np.asarray(pm.ncc_cost_vector(data, jnp.asarray(plane), offs))

    interior = np.zeros(rect_c.shape[1:], bool)
    interior[8:-8, 8:-8] = True
    for v in range(v_pad):
        a = rect_c[v][interior]
        b = ref_c[v][interior]
        both = (a < COST_MAX) & (b < COST_MAX)
        assert both.mean() > 0.85, (v, float(both.mean()))
        # Same cost landscape: tight median agreement + high correlation.
        diff = np.abs(a[both] - b[both])
        assert np.median(diff) < 0.05, (v, float(np.median(diff)))
        # Correlation is diluted by near-zero costs sampled through
        # rotated windows; 0.6 plus the tight median bound above pins the
        # two paths to the same landscape.
        corr = np.corrcoef(a[both], b[both])[0, 1]
        assert corr > 0.6, (v, float(corr))


def test_geom_cost_zero_for_consistent_depths(scene):
    sc, inputs, data, rh, views, v_pad = scene
    params = schedule_params(PatchMatchParams(), 0, None)
    cam, plane_gt = _gt_plane_field(sc, inputs)

    # Source depths = ground truth -> forward-backward error ~ 0.
    src_depths = np.stack([sc.gt_depths[i + 1] for i in range(v_pad)])
    views_g = rectcost.build_rect_views(
        rh, inputs.images, src_depths, cameras=inputs.cameras,
        interpret=True)
    offs = pm.strong_offsets(params)
    costs = np.asarray(rectcost.rect_cost_vector(
        views_g, rh.statics, jnp.asarray(plane_gt), data.view_valid,
        params, offs, geom=True, interpret=True))
    costs_ng = np.asarray(rectcost.rect_cost_vector(
        views_g, rh.statics, jnp.asarray(plane_gt), data.view_valid,
        params, offs, geom=False, interpret=True))
    interior = np.zeros(costs.shape[1:], bool)
    interior[8:-8, 8:-8] = True
    g = (costs - costs_ng)[0][interior] / params.geom_factor
    gv = g[(costs_ng[0][interior] < COST_MAX)]
    # Median forward-backward reprojection error under true geometry < 1 px.
    assert np.median(gv) < 1.0, float(np.median(gv))


def test_stacked_banded_matches_unbanded(scene, monkeypatch):
    """Row-banded accumulation (full-res HBM bound) must reproduce the
    unbanded stacked cost field — every read is row-local, so banding
    reorders only the slicing, not the math; the residual is XLA fusion
    noise (the lax.map band body fuses FMA/exp chains differently than
    the unbanded program), bounded at 1e-3 cost units."""
    sc, inputs, data, rh, views, v_pad = scene
    params = schedule_params(PatchMatchParams(), 0, None)
    offs = pm.strong_offsets(params)
    cam, plane_gt = _gt_plane_field(sc, inputs)
    src_depths = np.stack([sc.gt_depths[i + 1] for i in range(v_pad)])
    views_g = rectcost.build_rect_views(
        rh, inputs.images, src_depths, cameras=inputs.cameras,
        interpret=True)
    stack = rectcost.build_rect_stack(views_g, rh.statics)
    plane = jnp.asarray(plane_gt)

    for stride, geom in ((1, False), (1, True), (2, False)):
        cache = (rectcost.build_eval_cache(stack, params, offs,
                                           stride=stride, geom=geom)
                 if stride > 1 else None)
        ref = np.asarray(rectcost.rect_cost_vector_stacked(
            stack, plane, data.view_valid, params, offs, geom=geom,
            interpret=True, stride=stride, cache=cache))
        monkeypatch.setattr(rectcost, "BAND_FULL_BYTES", 0)
        monkeypatch.setattr(rectcost, "BAND_FIELD_BYTES",
                            4 * v_pad * 20 * stack.src_rect.shape[-1])
        banded = np.asarray(rectcost.rect_cost_vector_stacked(
            stack, plane, data.view_valid, params, offs, geom=geom,
            interpret=True, stride=stride, cache=cache))
        monkeypatch.setattr(rectcost, "BAND_FULL_BYTES", 192e6)
        monkeypatch.setattr(rectcost, "BAND_FIELD_BYTES", 48e6)
        np.testing.assert_allclose(banded, ref, rtol=0, atol=1e-3,
                                   err_msg=f"stride={stride} geom={geom}")
