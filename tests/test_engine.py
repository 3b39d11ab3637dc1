"""Engine-level tests: sweep convergence on synthetic ground truth.

PatchMatch is stochastic, so assertions are statistical (SURVEY.md §4):
depth-error quantiles, not bits.
"""
import numpy as np
import jax
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, PixelState, schedule_params
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.sweep import run_sweep_jit
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def plane_scene(tmp_path_factory):
    folder = tmp_path_factory.mktemp("scene")
    return make_plane_scene(folder, width=96, height=72, num_views=4, seed=1)


def _first_sweep(scene, v_pad=3):
    problems = scene_mod.generate_sample_list(scene.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    data = st_mod.build_sweep_data(inputs, v_pad)
    params = schedule_params(PatchMatchParams(), 0, None)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0),
                              params.use_APD)
    return data, st, params, inputs


def test_first_init_sweep_converges(plane_scene):
    data, st, params, _ = _first_sweep(plane_scene)
    out = run_sweep_jit(data, st, params)
    depth = np.asarray(out.plane[..., 3])
    gt = plane_scene.gt_depths[0]
    err = np.abs(depth - gt) / gt
    assert np.median(err) < 0.01, np.median(err)
    assert (err < 0.05).mean() > 0.9

    # Normals (world frame) should roughly match ground truth.
    n = np.asarray(out.plane[..., :3])
    cos = np.clip(np.sum(n * plane_scene.gt_normals[0], -1), -1, 1)
    assert np.degrees(np.arccos(np.median(cos))) < 15.0


def test_border_margin_unknown(plane_scene):
    data, st, params, _ = _first_sweep(plane_scene)
    out = run_sweep_jit(data, st, params)
    weak = np.asarray(out.weak)
    assert (weak[:6, :] == int(PixelState.UNKNOWN)).all()
    assert (weak[:, -6:] == int(PixelState.UNKNOWN)).all()
    # Interior of a fully-textured plane scene is overwhelmingly STRONG.
    interior = weak[6:-6, 6:-6]
    assert (interior == int(PixelState.STRONG)).mean() > 0.8


def test_sweep_deterministic(plane_scene):
    data, st, params, _ = _first_sweep(plane_scene)
    a = run_sweep_jit(data, st, params)
    b = run_sweep_jit(data, st, params)
    np.testing.assert_array_equal(np.asarray(a.plane), np.asarray(b.plane))


def test_refine_iter_improves_or_holds(plane_scene):
    data, st, params, inputs = _first_sweep(plane_scene)
    out = run_sweep_jit(data, st, params)
    err0 = np.abs(np.asarray(out.plane[..., 3]) - plane_scene.gt_depths[0]) \
        / plane_scene.gt_depths[0]

    # Geometric pass: feed every view the ground-truth depths of its sources
    # (ideal exchange) and run REFINE_ITER.
    params_b = schedule_params(PatchMatchParams(), 0, 0)
    gt_stack = np.stack([plane_scene.gt_depths[0]] +
                        [plane_scene.gt_depths[i] for i in (1, 2, 3)])
    inputs.src_depths = gt_stack
    inputs.prior_depth = np.asarray(out.plane[..., 3])
    inputs.prior_normal = np.asarray(out.plane[..., :3])
    inputs.prior_selected_views = np.asarray(out.selected).astype(np.int32)
    data_b = st_mod.build_sweep_data(inputs, 3)
    st_b = st_mod.init_pm_state(inputs, 3, jax.random.key(7), False)
    out_b = run_sweep_jit(data_b, st_b, params_b)
    err1 = np.abs(np.asarray(out_b.plane[..., 3]) - plane_scene.gt_depths[0]) \
        / plane_scene.gt_depths[0]
    assert np.median(err1) <= np.median(err0) * 2.0
    assert np.median(err1) < 0.01
