"""API surface parity with the reference wheel (src/DPE_MVS/__init__.py)."""
import inspect

import numpy as np


def test_dpe_mvs_signature():
    from dpe_mvs_tpu import dpe_mvs
    sig = inspect.signature(dpe_mvs)
    names = [p for p in sig.parameters if sig.parameters[p].kind
             is not inspect.Parameter.KEYWORD_ONLY]
    assert names == ["dense_folder", "gpu_index", "verbose", "fusion",
                     "viz", "depth", "normal", "weak", "edge"]
    defaults = {n: sig.parameters[n].default for n in names[1:]}
    assert defaults == {"gpu_index": 0, "verbose": True, "fusion": False,
                        "viz": False, "depth": True, "normal": False,
                        "weak": False, "edge": False}


def test_cli_usage_error():
    from dpe_mvs_tpu.cli import main
    assert main([]) == 1


def test_config_profiles():
    from dpe_mvs_tpu.config import PROFILES, PatchMatchParams
    assert PROFILES["eth3d"].top_k == 4
    assert PROFILES["tnt"].top_k == 8
    p = PROFILES["tnt"].apply(PatchMatchParams())
    assert p.top_k == 8 and p.high_res_img is False


def test_schedule_params_matches_reference():
    """Parameter schedule must match main.cpp:508-556."""
    from dpe_mvs_tpu.config import PatchMatchParams, RunState, schedule_params
    base = PatchMatchParams()
    p = schedule_params(base, 0, None)
    assert p.state == RunState.FIRST_INIT and not p.use_APD and not p.use_edge
    assert not p.geom_consistency and p.weak_peak_radius == 6
    p = schedule_params(base, 0, 1)
    assert p.state == RunState.REFINE_ITER and p.geom_consistency
    assert p.weak_peak_radius == 2 and not p.use_APD
    p = schedule_params(base, 2, None)
    assert p.state == RunState.REFINE_INIT and p.use_APD and p.use_edge
    assert abs(p.ransac_threshold - (0.01 - 2 * 0.00125)) < 1e-9
    assert p.rotate_time == 4
    p = schedule_params(base, 1, 0)
    assert p.rotate_time == 2 and p.weak_peak_radius == 4


def test_round_num():
    from dpe_mvs_tpu.config import EngineConfig, compute_round_num
    cfg = EngineConfig()
    assert compute_round_num(640, 480, cfg) == 2   # min 2 rounds
    assert compute_round_num(6048, 4032, cfg) == 4
    assert compute_round_num(1600, 1200, cfg) == 2


def test_error_parity_runtimeerror(tmp_path):
    """Any pipeline failure must surface as RuntimeError, as the reference
    bindings turn every nonzero return into one (csrc/bindings.cpp:27)."""
    import pytest
    from dpe_mvs_tpu import dpe_mvs
    from dpe_mvs_tpu.utils.synthetic import make_plane_scene

    # Missing dense folder entirely.
    with pytest.raises(RuntimeError):
        dpe_mvs(str(tmp_path / "nonexistent"))

    # Corrupt cam.txt.
    sc = make_plane_scene(str(tmp_path / "a"), width=48, height=36,
                          num_views=3, seed=0)
    cam = tmp_path / "a" / "cams" / "00000000_cam.txt"
    cam.write_text("extrinsic\nnot a number\n")
    with pytest.raises(RuntimeError):
        dpe_mvs(sc.folder)

    # Missing image.
    sc2 = make_plane_scene(str(tmp_path / "b"), width=48, height=36,
                           num_views=3, seed=0)
    (tmp_path / "b" / "images" / "00000001.jpg").unlink()
    with pytest.raises(RuntimeError):
        dpe_mvs(sc2.folder)
