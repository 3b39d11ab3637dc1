"""Public API with reference signature parity.

``dpe_mvs(dense_folder, gpu_index, verbose, fusion, viz, depth, normal, weak,
edge) -> int`` mirrors ``src/DPE_MVS/__init__.py:6-18`` exactly; the
``gpu_index`` argument selects the JAX device ordinal (the reference calls
``cudaSetDevice``, main.cpp:478).
"""
from __future__ import annotations

from typing import Optional

from .config import EngineConfig


def dpe_mvs(
    dense_folder: str,
    gpu_index: int = 0,
    verbose: bool = True,
    fusion: bool = False,
    viz: bool = False,
    depth: bool = True,
    normal: bool = False,
    weak: bool = False,
    edge: bool = False,
    *,
    cfg: Optional[EngineConfig] = None,
    parallel: bool = False,
    resume: bool = False,
) -> int:
    """Run the full DPE-MVS pipeline. Returns 0 on success; raises
    RuntimeError on failure (as the reference bindings do,
    csrc/bindings.cpp:27).

    Extensions over the reference: ``parallel=True`` shards the problem list
    over all available devices (view-data parallelism, SURVEY.md §2.3);
    ``resume=True`` continues from the last checkpointed iteration."""
    from .utils import jaxconfig
    jaxconfig.setup()
    import jax

    if parallel:
        # Multi-host bootstrap (no-op unless DPE_MVS_COORDINATOR is set);
        # must run before the first jax.devices() call.
        from .parallel.mesh import initialize_distributed
        initialize_distributed()

    devices = jax.devices()
    if 0 <= gpu_index < len(devices):
        dev = devices[gpu_index]
    else:
        dev = devices[0]

    try:
        if parallel and len(devices) > 1:
            from .pipeline.parallel_schedule import run_pipeline_parallel
            ret = run_pipeline_parallel(
                dense_folder, verbose=verbose, fusion=fusion, viz=viz,
                depth=depth, normal=normal, weak=weak, edge=edge, cfg=cfg,
                resume=resume)
        else:
            from .pipeline.schedule import run_pipeline
            with jax.default_device(dev):
                ret = run_pipeline(
                    dense_folder, verbose=verbose, fusion=fusion, viz=viz,
                    depth=depth, normal=normal, weak=weak, edge=edge, cfg=cfg,
                    resume=resume)
    except (KeyboardInterrupt, RuntimeError):
        raise
    except Exception as e:
        # Reference parity: any pipeline failure surfaces as RuntimeError
        # (csrc/bindings.cpp:27 turns any nonzero return into RuntimeError).
        raise RuntimeError(f"DPE-MVS failed: {e}") from e
    if ret != 0:
        raise RuntimeError(f"DPE-MVS failed with code {ret}")
    return ret
