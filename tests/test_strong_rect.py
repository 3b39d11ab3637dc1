"""End-to-end staged sweep on the rectified engine (the TPU path), on CPU
interpret mode: must recover the ground-truth plane like the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, RunState
from dpe_mvs_tpu.engine import rectcost
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.stages import run_sweep_staged
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


def _problem(tmp_path, w=64, h=48, views=3, seed=0):
    sc = make_plane_scene(str(tmp_path), width=w, height=h, num_views=views,
                          seed=seed)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    return sc, inputs


def test_rect_sweep_recovers_plane(tmp_path):
    sc, inputs = _problem(tmp_path)
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views = rectcost.build_rect_views(rh, inputs.images, None,
                                      cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views)
    params = PatchMatchParams(
        state=RunState.FIRST_INIT, use_APD=False, use_edge=False,
        use_limit=False, use_label=False, max_iterations=2)
    st0 = st_mod.init_pm_state(inputs, v_pad, jax.random.key(3), False)

    st = run_sweep_staged(data, st0, params, rstat=rh.statics)

    depth = np.asarray(st.plane[..., 3])
    gt = sc.gt_depths[0]
    interior = np.zeros(gt.shape, bool)
    interior[6:-6, 6:-6] = True
    ok = interior & (depth > 0)
    rel = np.abs(depth[ok] - gt[ok]) / gt[ok]
    assert ok.mean() > 0.5
    med = float(np.median(rel))
    assert med < 0.02, med
