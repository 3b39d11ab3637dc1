"""Native host runtime loader.

Tries to import the compiled ``_dpe_host`` extension; if missing, attempts a
one-time in-tree build (g++ via setuptools); on any failure the callers fall
back to the pure-Python implementations, so the native library is a
performance feature, never a hard dependency.
"""
from __future__ import annotations

import os
import sys

_mod = None
_tried = False


def _build() -> bool:
    """Compile dpe_host.cpp into this directory."""
    import subprocess
    import sysconfig

    import numpy as np

    here = os.path.dirname(__file__)
    src = os.path.join(here, "dpe_host.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_dpe_host" + ext)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include_py = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{np.get_include()}",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def get():
    """Return the native module or None."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        from . import _dpe_host  # type: ignore
        _mod = _dpe_host
        return _mod
    except ImportError:
        pass
    if os.environ.get("DPE_MVS_TPU_NO_NATIVE"):
        return None
    if _build():
        try:
            from . import _dpe_host  # type: ignore
            _mod = _dpe_host
        except ImportError:
            _mod = None
    return _mod
