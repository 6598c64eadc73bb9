"""Matmul precision policy for accuracy-critical paths.

On TPU, float32 matmuls/einsums default to bf16 MXU passes. The
geometry stack (GN normal-equation accumulations, pose-composition
chains, CG iterations) compounds that rounding into metre-level error:
the 30-frame benchmark circle measures ATE 0.716 m under default
precision vs 0.055 m under float32 precision (identical code, CPU
reference 0.062 m). The descriptor/BEV side (Radon splats, all-pairs
correlation einsums, DiSCO convs) is retrieval-ranking only — bf16 is
harmless there and 2-3x faster on the MXU.

Policy: wrap accuracy-critical ENTRY POINTS with `accurate`, which
traces them under `jax.default_matmul_precision("float32")` (the
context applies at trace time, so cached executions pay nothing).
Descriptor paths stay on the fast default.
"""
from __future__ import annotations

import functools

import jax

# Explicit per-op precision for pose/geometry math that must be exact
# regardless of the ambient context: 3x3 rotation chains gain nothing
# from bf16 MXU passes, but compound its ~4e-3 rounding into metre-level
# trajectory error when composed over hundreds of frames (measured:
# identical pipeline, ATE 0.54 m default vs 0.057 m f32 on TPU).
HIGHEST = jax.lax.Precision.HIGHEST


def accurate(fn):
    """Trace `fn` under float32 matmul precision. Place ABOVE any
    `jax.jit` decorator so the context is active while tracing.

    Since the package now sets f32 as the GLOBAL default at import
    (`mr_slam_tpu/__init__.py`), this wrapper is belt-and-braces: it
    keeps the entry point correct even if an embedding application
    resets the global default."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    wrapper.__wrapped__ = getattr(fn, "__wrapped__", fn)
    return wrapper


def fast(fn):
    """Trace `fn` under the hardware-default (TPU: bf16 MXU) matmul
    precision — the explicit opt-in for throughput-critical descriptor
    batches where ranking, not geometry, is the output (retrieval
    einsums, Radon splats, DiSCO convs). Place ABOVE `jax.jit`."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return fn(*args, **kwargs)

    wrapper.__wrapped__ = getattr(fn, "__wrapped__", fn)
    return wrapper
