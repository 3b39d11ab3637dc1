"""Rect-engine weak machinery (engine/weak_rect.py) on CPU interpret mode.

The rect weak path approximates ``ComputeBilateralNCCNew`` (DPE.cu:557-690)
with probe-volume interpolation (deviations documented in the module
docstring), so parity with the XLA path is statistical: an APD sweep from a
noisy prior must land near ground truth like ops/weak.propagate_weak does.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpe_mvs_tpu.config import PatchMatchParams, schedule_params
from dpe_mvs_tpu.engine import rectcost, weak_rect
from dpe_mvs_tpu.engine import state as st_mod
from dpe_mvs_tpu.engine.stages import run_sweep_staged
from dpe_mvs_tpu.io import scene as scene_mod
from dpe_mvs_tpu.utils.synthetic import make_plane_scene


def _problem(tmp_path, w=48, h=36, views=3, seed=3):
    sc = make_plane_scene(str(tmp_path), width=w, height=h, num_views=views,
                         seed=seed)
    problems = scene_mod.generate_sample_list(sc.folder)
    inputs = scene_mod.load_problem_inputs(
        problems[0], 1, need_prior=False, need_weak=False,
        need_src_depths=False)
    return sc, inputs


def test_apd_sweep_rect_after_round0(tmp_path):
    """Round-0 FIRST_INIT sweep -> round-1 REFINE_INIT APD sweep on the
    rect engine (the real schedule's entry into the weak machinery,
    main.cpp:508-556). The APD sweep must run end to end, touch some
    pixels, and not degrade the depth map (REFINE_INIT accepts only 0.1
    cost improvements, DPE.cu:1656-1665)."""
    sc, inputs = _problem(tmp_path)
    h, w = inputs.height, inputs.width
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)
    gt = sc.gt_depths[0]

    p0 = schedule_params(PatchMatchParams(), 0, None).replace(
        max_iterations=2)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    st = run_sweep_staged(data, st, p0, rstat=rh.statics)
    d0 = np.asarray(st.plane)[..., 3]
    weak_frac = float(np.mean(np.asarray(st.weak) == 0))
    assert 0.0 < weak_frac < 1.0        # classify produced a mixed map

    p1 = schedule_params(PatchMatchParams(), 1, None).replace(
        use_edge=False, use_limit=False, use_label=False, max_iterations=1)
    assert p1.use_APD
    st1 = st._replace(key=jax.random.key(7))
    st1 = run_sweep_staged(data, st1, p1, rstat=rh.statics)

    d1 = np.asarray(st1.plane)[..., 3]
    rel0 = np.abs(d0 - gt) / gt
    rel1 = np.abs(d1 - gt) / gt
    assert float(np.mean(np.abs(d1 - d0) > 1e-6)) > 0.005   # did work
    assert float(np.median(rel1)) <= float(np.median(rel0)) + 0.003


def test_apd_sweep_banded(tmp_path, monkeypatch):
    """The row-banded weak proposal body (full-resolution memory bound,
    weak_rect._weak_band_count) must preserve the APD sweep's acceptance
    behaviour: same rig as test_apd_sweep_rect_after_round0 with the band
    count forced to 4."""
    monkeypatch.setattr(weak_rect, "_weak_band_count", lambda H, W: 4)
    sc, inputs = _problem(tmp_path)
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)
    gt = sc.gt_depths[0]

    p0 = schedule_params(PatchMatchParams(), 0, None).replace(
        max_iterations=2)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    st = run_sweep_staged(data, st, p0, rstat=rh.statics)
    d0 = np.asarray(st.plane)[..., 3]

    p1 = schedule_params(PatchMatchParams(), 1, None).replace(
        use_edge=False, use_limit=False, use_label=False, max_iterations=1)
    st1 = st._replace(key=jax.random.key(7))
    st1 = run_sweep_staged(data, st1, p1, rstat=rh.statics)

    d1 = np.asarray(st1.plane)[..., 3]
    rel0 = np.abs(d0 - gt) / gt
    rel1 = np.abs(d1 - gt) / gt
    assert np.isfinite(d1).all()
    assert float(np.mean(np.abs(d1 - d0) > 1e-6)) > 0.005   # did work
    assert float(np.median(rel1)) <= float(np.median(rel0)) + 0.003


def test_propagate_stride2_sweep_quality(tmp_path):
    """The production strong path screens candidates at stride 2 at working
    resolutions (strong_rect.screen_stride auto gate) — force it on a small
    frame and check a FIRST_INIT sweep still converges like the exact path
    (the winner is re-scored exactly, so only argmin/view-selection see the
    subsampled costs)."""
    sc, inputs = _problem(tmp_path, w=64, h=48)
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)
    gt = sc.gt_depths[0]

    rels = {}
    for stride in (1, 2):
        p0 = schedule_params(PatchMatchParams(), 0, None).replace(
            max_iterations=2, propagate_stride=stride)
        st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
        st = run_sweep_staged(data, st, p0, rstat=rh.statics)
        d = np.asarray(st.plane)[..., 3]
        rels[stride] = np.abs(d - gt) / gt
    med1 = float(np.median(rels[1]))
    med2 = float(np.median(rels[2]))
    assert med2 < max(2.0 * med1, med1 + 0.003), (med1, med2)


def test_classify_stride2_labels_close_to_exact(tmp_path):
    """The production classify path runs stride-2 probe centers at working
    resolutions (patchmatch.depth_to_weak auto gate) — force stride 2 on a
    small frame via the params knob and check labels stay close to the
    exact per-pixel path (round-4 advisor: the production labeling path
    had zero test coverage and no opt-out)."""
    from dpe_mvs_tpu.engine import patchmatch as pm

    sc, inputs = _problem(tmp_path, w=64, h=48)
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)

    p0 = schedule_params(PatchMatchParams(), 0, None).replace(
        max_iterations=2)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    st = run_sweep_staged(data, st, p0, rstat=rh.statics)

    exact = np.asarray(pm.depth_to_weak(
        data, st, p0.replace(classify_stride=1), rstat=rh.statics))
    strided = np.asarray(pm.depth_to_weak(
        data, st, p0.replace(classify_stride=2), rstat=rh.statics))
    assert exact.shape == strided.shape
    agree = float(np.mean(exact == strided))
    assert agree > 0.85, agree          # r4 on-chip measurement: 96%


def test_streaming_weakprep_matches_store(tmp_path, monkeypatch):
    """Streaming mode (no (V, 8, S, H, W) anchor-profile store — the
    full-resolution memory path) must produce the same APD sweep as store
    mode: the band gather reads the same rect-frame volumes at the same
    anchor coords. Forced via AP_STORE_MAX_PX=0 on a small frame."""
    sc, inputs = _problem(tmp_path, w=56, h=40)
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)

    p0 = schedule_params(PatchMatchParams(), 0, None).replace(
        max_iterations=2)
    st = st_mod.init_pm_state(inputs, v_pad, jax.random.key(0), False)
    st = run_sweep_staged(data, st, p0, rstat=rh.statics)

    p1 = schedule_params(PatchMatchParams(), 1, None).replace(
        use_edge=False, use_limit=False, use_label=False, max_iterations=1)
    st_store = run_sweep_staged(data, st._replace(key=jax.random.key(7)),
                                p1, rstat=rh.statics)

    monkeypatch.setattr(weak_rect, "AP_STORE_MAX_PX", 0)
    # Clear the stage-jit caches: the weakprep executable is keyed on
    # shapes/params only, and the store-mode trace would be reused.
    jax.clear_caches()
    st_stream = run_sweep_staged(data, st._replace(key=jax.random.key(7)),
                                 p1, rstat=rh.statics)

    d_a = np.asarray(st_store.plane)[..., 3]
    d_b = np.asarray(st_stream.plane)[..., 3]
    np.testing.assert_allclose(d_b, d_a, rtol=2e-4, atol=2e-4)


def test_interp_profile_matches_lerp():
    rng = np.random.default_rng(0)
    S = weak_rect.PROBE_S
    prof = rng.uniform(0, 2, (S, 8, 16)).astype(np.float32)
    srel = rng.uniform(-1.2, 1.2, (8, 16)).astype(np.float32) * \
        (S / 2) * weak_rect.PROBE_STEP
    val, ok = weak_rect.interp_profile(jnp.asarray(prof), jnp.asarray(srel))
    val, ok = np.asarray(val), np.asarray(ok)
    sf = srel / weak_rect.PROBE_STEP + (S - 1) / 2.0
    inr = (sf >= 0) & (sf <= S - 1)
    assert np.array_equal(ok, inr)
    s0 = np.clip(np.floor(sf), 0, S - 2).astype(int)
    f = np.clip(sf - s0, 0, 1)
    ii, jj = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    expect = prof[s0, ii, jj] * (1 - f) + prof[s0 + 1, ii, jj] * f
    np.testing.assert_allclose(val[inr], expect[inr], rtol=1e-5)


def test_interp_profile_invalid_marker():
    S = weak_rect.PROBE_S
    prof = np.full((S, 4, 4), weak_rect.VOL_INVALID, np.float32)
    val, ok = weak_rect.interp_profile(
        jnp.asarray(prof), jnp.zeros((4, 4), jnp.float32))
    assert not np.asarray(ok).any()


def _batched_cost_fields(data, statics, planes, params, geom,
                         interpret=None):
    """The S-plane-field batched form of rect_cost_vector, built on
    rectcost._sweep_ncc_volume — retired from the production tree in
    round 5 (VERDICT r4 weak #7) and kept here as the test oracle that
    exercises the volume machinery (the classify/weakprep probe path)
    against the per-field evaluator."""
    import jax
    from dpe_mvs_tpu.config import COST_MAX, GEOM_COST_MAX
    from dpe_mvs_tpu.engine.rectcost import (
        S_CHUNK, _sweep_ncc_volume, plane_to_rect, warp_bwd_channels,
        warp_fwd_channels)
    from dpe_mvs_tpu.ops import ncc

    S, H, W = planes.shape[:3]
    offs = ncc.window_offsets(params.strong_radius, params.strong_increment)
    out = []
    for i, rv in enumerate(data.rect):
        Hp, Wp = rv.ref_rect.shape
        pr = jax.vmap(lambda p: plane_to_rect(p, rv.R2r))(planes)
        chans = jnp.moveaxis(pr, -1, 1).reshape(S * 4, H, W)
        prw = warp_fwd_channels(rv, statics, i, chans, interpret=interpret)
        prw = prw.reshape(S, 4, Hp, Wp)
        prw = jnp.concatenate([prw, jnp.broadcast_to(
            prw[-1:], (S_CHUNK, 4, Hp, Wp))])

        def coeff_fn(c0, sc):
            p_c = jax.lax.dynamic_slice_in_dim(prw, c0, sc, axis=0)
            nr = p_c[:, :3]
            d = p_c[:, 3]
            safe = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
            return (rv.b * nr[:, 0] / safe, rv.b * nr[:, 1] / safe,
                    rv.b * rv.f * nr[:, 2] / safe)

        vol, gvol, valid = _sweep_ncc_volume(
            rv, coeff_fn, S, offs, params.sigma_spatial, params.sigma_color,
            with_geom=geom, interpret=interpret)
        cost_i = jnp.where(valid, vol, COST_MAX)
        if geom:
            cost_i = cost_i + params.geom_factor * jnp.where(
                valid, gvol, GEOM_COST_MAX)
        back = warp_bwd_channels(rv, statics, i, cost_i, interpret=interpret)
        cmax = COST_MAX + (params.geom_factor * GEOM_COST_MAX if geom
                           else 0.0)
        back = jnp.where((rv.orig_ok[None] > 0.5) & data.view_valid[i],
                         back, cmax)
        out.append(back)
    return jnp.moveaxis(jnp.stack(out), 0, 1)                # (S, V, H, W)


def test_batched_cost_fields_match_rect_cost_vector(tmp_path):
    """The shared-ref-sums batched evaluator must agree with per-field
    rect_cost_vector (same window math, same validity incl. cheirality)."""
    from dpe_mvs_tpu.engine import patchmatch as pm
    from dpe_mvs_tpu.geometry import cameras as geo
    from dpe_mvs_tpu.ops import planes as planegen

    sc, inputs = _problem(tmp_path)
    h, w = inputs.height, inputs.width
    v_pad = 2
    rh = rectcost.build_rect_host(inputs.cameras, inputs.width,
                                  inputs.height, v_pad)
    views_r = rectcost.build_rect_views(rh, inputs.images, None,
                                        cameras=inputs.cameras)
    data = st_mod.build_sweep_data(inputs, v_pad)._replace(rect=views_r)
    params = PatchMatchParams()

    px, py = geo.pixel_grid(h, w)
    keys = jax.random.split(jax.random.key(5), 3)
    planes = jnp.stack([
        planegen.random_plane(k, data.ref_cam, px, py, inputs.depth_min,
                              inputs.depth_max) for k in keys])

    batched = np.asarray(_batched_cost_fields(
        data, rh.statics, planes, params, geom=False))      # (S, V, H, W)
    offs = pm.strong_offsets(params)
    for s in range(3):
        ref = np.asarray(rectcost.rect_cost_vector(
            data.rect, rh.statics, planes[s], data.view_valid, params,
            offs, geom=False))
        np.testing.assert_allclose(batched[s], ref, rtol=1e-4, atol=1e-4)
