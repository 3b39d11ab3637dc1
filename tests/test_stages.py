"""Staged executor must compute exactly what the monolithic sweep computes."""
import jax
import numpy as np
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, RunState
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.stages import run_sweep_staged
from dpe_mvs_tpu.engine.sweep import run_sweep_jit
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


def _problem(tmp_path, w=48, h=36, views=3, seed=0):
    sc = make_plane_scene(str(tmp_path), width=w, height=h, num_views=views,
                          seed=seed)
    problems = scene_mod.generate_sample_list(sc.folder)
    return scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)


@pytest.mark.parametrize("use_APD,use_edge,geom", [
    (False, False, False),   # round-0 pass A (bench config)
    (True, True, False),     # later-round pass A
    (True, True, True),      # geometric pass B
])
def test_staged_matches_monolithic(tmp_path, use_APD, use_edge, geom):
    inputs = _problem(tmp_path)
    v_pad = 2
    data = st_mod.build_sweep_data(inputs, v_pad)
    if geom:
        data = data._replace(
            src_depths=data.src_depths.at[:].set(
                0.5 * (inputs.depth_min + inputs.depth_max)))
    params = PatchMatchParams(
        state=RunState.FIRST_INIT if not geom else RunState.REFINE_ITER,
        use_APD=use_APD, use_edge=use_edge, use_limit=use_APD,
        use_label=use_APD, geom_consistency=geom, max_iterations=2)
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(7), use_APD)
    if geom or params.state != RunState.FIRST_INIT:
        # REFINE paths need a plausible prior plane.
        mid = 0.5 * (inputs.depth_min + inputs.depth_max)
        plane = np.zeros((inputs.height, inputs.width, 4), np.float32)
        plane[..., 2] = -1.0
        plane[..., 3] = mid
        st0 = st0._replace(plane=jax.numpy.asarray(plane))

    ref = run_sweep_jit(data, st0, params)
    staged = run_sweep_staged(data, st0, params)

    np.testing.assert_allclose(np.asarray(ref.plane),
                               np.asarray(staged.plane), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.weak),
                                  np.asarray(staged.weak))
    np.testing.assert_array_equal(np.asarray(ref.selected),
                                  np.asarray(staged.selected))
    np.testing.assert_allclose(np.asarray(ref.cost), np.asarray(staged.cost),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(jax.random.key_data(ref.key)),
                          np.asarray(jax.random.key_data(staged.key)))


def test_staged_input_state_not_invalidated(tmp_path):
    """Donation inside the staged path must not invalidate the caller's
    state (bench reuses st0 across runs)."""
    inputs = _problem(tmp_path)
    data = st_mod.build_sweep_data(inputs, 2)
    params = PatchMatchParams(state=RunState.FIRST_INIT, use_APD=False,
                              use_edge=False, use_limit=False,
                              use_label=False, max_iterations=1)
    st0 = st_mod.init_pm_state(inputs, 2, jax.random.key(0), False)
    out1 = run_sweep_staged(data, st0, params)
    out2 = run_sweep_staged(data, st0, params)  # st0 must still be usable
    np.testing.assert_allclose(np.asarray(out1.plane),
                               np.asarray(out2.plane), rtol=0, atol=0)
