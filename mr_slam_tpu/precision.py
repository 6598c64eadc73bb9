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


def accurate(fn):
    """Trace `fn` under float32 matmul precision. Place ABOVE any
    `jax.jit` decorator so the context is active while tracing."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    wrapper.__wrapped__ = getattr(fn, "__wrapped__", fn)
    return wrapper
