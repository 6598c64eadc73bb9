"""Pallas TPU kernel: fused 5x5 terrain-feature stencil.

The reference computes per-cell plane fit + slope/roughness/step/
traversability in one CUDA kernel over the elevation grid
(`G_Mapfeature`, `gpu_process.cu:547-665`). The XLA twin
(`mapping/elevation.features`) builds TEN 5x5 box sums (each two
convolution passes) plus four 3x3 max/min passes before the closed-form
algebra — every pass a separate HBM-roundtripping fusion on big global
maps.

This kernel processes the grid in row stripes: each grid step DMAs one
(TH+4, Wp) halo stripe of (valid, height) from HBM into VMEM, computes
ALL box sums, the dilate/erode rounds and the full feature algebra
in-register, and writes the four feature layers once. Two array reads +
four writes of HBM traffic total, vs ~30 array passes for the XLA twin.

Numerics match `elevation.features` exactly except at the outer 2-cell
border of `step` when every height in a window is negative (the twin
pads with -inf, the stripe pads with empty cells whose z=0).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2      # 5x5 window radius


def _stripe_rows(wp: int) -> int:
    """Output rows per stripe, sized to keep stripe temporaries within
    the ~16 MB VMEM budget for wide maps."""
    if wp <= 1280:
        return 64
    if wp <= 2560:
        return 32
    return 16


def _box5_rows(a):
    """Sum 5 adjacent rows: (TH+8, Wp) -> (TH, Wp)."""
    th = a.shape[0] - 8
    return a[0:th] + a[1:th + 1] + a[2:th + 2] + a[3:th + 3] + a[4:th + 4]


def _box5_cols(a):
    """Sum 5 adjacent cols, full width: out[:, q] = sum_d a[:, q+d]
    (wrap garbage lands in the >=W padding cols, never read). Col j of
    the output = 5x5 window centred at original col j (input is 2-col
    padded)."""
    out = a
    for d in range(1, 5):
        out = out + jnp.roll(a, -d, axis=1)
    return out


def _max3x3(a):
    """3x3 max via rolls (wrap contamination stays inside the halo)."""
    m = a
    for dr in (-1, 1):
        m = jnp.maximum(m, jnp.roll(a, dr, axis=0))
    m2 = m
    for dc in (-1, 1):
        m2 = jnp.maximum(m2, jnp.roll(m, dc, axis=1))
    return m2


def _kernel(res_ref, v_hbm, z_hbm,
            grad_ref, rough_ref, step_ref, flags_ref,
            v_s, z_s, sem):
    i = pl.program_id(0)
    th = v_s.shape[0] - 8
    # stripe window padded to TH+8 rows (DMA slices must be 8-aligned);
    # rows 0..TH+3 carry the halo'd data, the last 4 rows are unused
    dv = pltpu.make_async_copy(
        v_hbm.at[pl.ds(i * th, th + 8), :], v_s, sem.at[0]
    )
    dz = pltpu.make_async_copy(
        z_hbm.at[pl.ds(i * th, th + 8), :], z_s, sem.at[1]
    )
    dv.start()
    dz.start()
    dv.wait()
    dz.wait()

    res = res_ref[0, 0]
    v = v_s[:]                      # (TH+4, Wp) valid as {0,1} float
    z = z_s[:]                      # heights, 0 where invalid
    S = v.shape
    # local coordinates (translation-invariant moments); iota must be
    # integer-typed on TPU, cast after
    x = jax.lax.broadcasted_iota(jnp.int32, S, 0).astype(jnp.float32) * res
    y = jax.lax.broadcasted_iota(jnp.int32, S, 1).astype(jnp.float32) * res

    def box(a):
        return _box5_cols(_box5_rows(a))

    S1 = box(v)
    Sx = box(v * x)
    Sy = box(v * y)
    Sz = box(v * z)
    Sxx = box(v * x * x)
    Syy = box(v * y * y)
    Sxy = box(v * x * y)
    Sxz = box(v * x * z)
    Syz = box(v * y * z)
    Szz = box(v * z * z)
    n = jnp.maximum(S1, 1.0)
    mx, my, mz = Sx / n, Sy / n, Sz / n
    cxx = Sxx / n - mx * mx
    cyy = Syy / n - my * my
    cxy = Sxy / n - mx * my
    cxz = Sxz / n - mx * mz
    cyz = Syz / n - my * mz
    czz = Szz / n - mz * mz
    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    a = (cyy * cxz - cxy * cyz) / det_safe
    b = (cxx * cyz - cxy * cxz) / det_safe
    grad = jnp.sqrt(a * a + b * b)  # tan(slope); atan applied outside
    resid = jnp.maximum(czz - (a * cxz + b * cyz), 0.0)
    rough = jnp.sqrt(resid)

    # step: 2 rounds of 3x3 dilate/erode on the haloed stripe, then crop
    # to the box-sum alignment (original col j = stripe col j+HALO)
    zmax = z
    zmin = jnp.where(v > 0, z, jnp.inf)
    for _ in range(HALO):
        zmax = _max3x3(zmax)
        zmin = -_max3x3(-zmin)
    zmax_c = jnp.roll(zmax, -HALO, axis=1)[HALO:HALO + th, :]
    zmin_c = jnp.roll(zmin, -HALO, axis=1)[HALO:HALO + th, :]
    step_c = jnp.where(jnp.isfinite(zmin_c), zmax_c - zmin_c, 0.0)

    v_center = jnp.roll(v, -HALO, axis=1)[HALO:HALO + th, :]
    enough = S1 >= 3.0
    # flags: 0 = not enough, 1 = enough but centre invalid, 2 = both
    flags = enough.astype(jnp.float32) * (1.0 + (v_center > 0))
    grad_ref[:] = grad
    rough_ref[:] = rough
    step_ref[:] = step_c
    flags_ref[:] = flags


@partial(
    jax.jit,
    static_argnames=("window", "slope_crit", "rough_crit", "step_crit"),
)
def terrain_features(
    height: jax.Array,      # (H, W)
    valid: jax.Array,       # (H, W) bool
    resolution: jax.Array,  # () metres/cell
    window: int = 5,
    slope_crit: float = 0.6,
    rough_crit: float = 0.15,
    step_crit: float = 0.3,
):
    """Fused Pallas twin of `elevation.features` (window fixed at 5).
    Returns (slope, roughness, step, traversability), each (H, W)."""
    if window != 5:
        raise ValueError("pallas stencil is specialized to window=5")
    H, W = height.shape
    Wp = pl.cdiv(W + 2 * HALO, 128) * 128
    TH = _stripe_rows(Wp)
    Hp = pl.cdiv(H, TH) * TH
    # rows: 2 halo on top, enough bottom padding that the last stripe's
    # (TH+8)-row DMA window stays in bounds
    pad_bot = Hp + 8 - HALO - H
    v = jnp.pad(valid.astype(jnp.float32),
                ((HALO, pad_bot), (HALO, Wp - W - HALO)))
    z = jnp.pad(jnp.where(valid, height, 0.0),
                ((HALO, pad_bot), (HALO, Wp - W - HALO)))
    n_stripes = Hp // TH
    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)] * 4
    outs = pl.pallas_call(
        _kernel,
        out_shape=out_shape,
        grid=(n_stripes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((TH, Wp), lambda i: (i, 0))] * 4,
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp), jnp.float32),
            pltpu.VMEM((TH + 8, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(jnp.reshape(resolution.astype(jnp.float32), (1, 1)), v, z)
    grad, rough_raw, step, flags = (o[:H, :W] for o in outs)
    # arctan + final blend outside the kernel (atan has no Pallas TPU
    # lowering); this is ONE fused elementwise XLA pass over the outputs
    slope_raw = jnp.arctan(grad)
    enough = flags >= 1.0
    trav = 1.0 - jnp.maximum(
        jnp.maximum(slope_raw / slope_crit, rough_raw / rough_crit),
        step / step_crit,
    )
    trav = jnp.clip(trav, 0.0, 1.0)
    trav = jnp.where(flags >= 2.0, trav, 0.5)
    slope = jnp.where(enough, slope_raw, 0.0)
    rough = jnp.where(enough, rough_raw, 0.0)
    return slope, rough, step, trav
