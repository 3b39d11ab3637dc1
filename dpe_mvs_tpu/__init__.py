"""dpe_mvs_tpu — TPU-native multi-view stereo with dual-level precision edges.

A from-scratch JAX/XLA re-design of the capabilities of shunkenney/DPE-MVS
(PatchMatch MVS with edge-guided weak-texture handling), built for TPU:
vectorized per-pixel plane-hypothesis propagation, pointer-doubling support
maps, fused NCC window sampling via XLA gathers, deterministic keyed RNG, and
view-level sharding over a device mesh.

Public API (reference parity): :func:`dpe_mvs`.
"""
from .api import dpe_mvs
from .config import EngineConfig, PatchMatchParams, ETH3D, TANKS_AND_TEMPLES

__all__ = ["dpe_mvs", "EngineConfig", "PatchMatchParams", "ETH3D",
           "TANKS_AND_TEMPLES"]
__version__ = "0.1.0"
