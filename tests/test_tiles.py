"""Tile-level sharding + halo exchange (parallel/tiles.py, SURVEY §2.3 #3).

A FIRST_INIT photometric sweep banded over 4 virtual devices must produce
a depth map statistically equivalent to the unsharded sweep: the bands'
rect frames are fitted per crop and the PRNG streams differ per band, so
the comparison is against ground truth (both must converge), plus a halo
consistency check (band interiors must agree with each other where the
propagation cones overlap).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
from dpe_mvs_tpu.engine import rectcost
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.stages import run_sweep_staged
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.parallel import mesh as mesh_mod
from dpe_mvs_tpu.parallel import tiles
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


@pytest.fixture(scope="module")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >=4 virtual devices")
    return devs


def test_tile_sharded_sweep_matches_unsharded(tmp_path, eight_devices):
    w, h, views = 96, 80, 3
    sc = make_plane_scene(str(tmp_path), width=w, height=h,
                          num_views=views, seed=5)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    v_pad = views - 1
    gt = sc.gt_depths[0]
    params = schedule_params(PatchMatchParams(), 0, None).replace(
        max_iterations=2, use_APD=False)

    # Unsharded reference sweep (rect engine).
    rh = rectcost.build_rect_host(inputs.cameras, w, h, v_pad)
    rviews = rectcost.build_rect_views(rh, inputs.images, None,
                                       cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=rviews)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    st = run_sweep_staged(data, st, params, rstat=rh.statics)
    d_ref = np.asarray(st.plane)[..., 3]
    rel_ref = np.abs(d_ref - gt) / gt

    # Tile-sharded sweep: 4 row bands, halo 16 (small image).
    n_tiles, halo = 4, 16
    datas, rstat, hb = tiles.build_tile_data(inputs, n_tiles, v_pad,
                                             halo=halo)
    sts = [st_mod.init_pm_state(
        tiles.build_tile_inputs(inputs, n_tiles, halo)[0][t], v_pad,
        jax.random.key(10 + t), False) for t in range(n_tiles)]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    mesh = mesh_mod.make_mesh(eight_devices[:n_tiles], axis="tile")
    out = tiles.tile_sharded_sweep(mesh, datas, states, params, rstat, hb,
                                   halo=halo)
    stitched = tiles.stitch_tiles(jax.device_get(out), h)
    d_tile = np.asarray(stitched.plane)[..., 3]
    assert d_tile.shape == (h, w)
    rel_tile = np.abs(d_tile - gt) / gt

    # Both must converge on the synthetic plane; the banded run may not
    # exceed the unsharded error by more than noise.
    med_ref = float(np.median(rel_ref))
    med_tile = float(np.median(rel_tile))
    assert med_ref < 0.01
    assert med_tile < max(2.0 * med_ref, 0.01), (med_ref, med_tile)
    # Band seams: the rows adjacent to each band boundary must be as good
    # as the rest of the map (the halo exchange is what makes this hold).
    seams = []
    for t in range(1, n_tiles):
        r0 = t * hb
        if 2 <= r0 < h - 2:
            seams.append(rel_tile[r0 - 2:r0 + 2])
    seam_med = float(np.median(np.concatenate(seams)))
    assert seam_med < max(3.0 * med_tile, 0.015), (seam_med, med_tile)
