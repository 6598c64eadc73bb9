"""DiSCO descriptors: rotation-invariant FFT-magnitude signatures.

Re-design of `disco_ros/main.py` + `models/DiSCO.py`: a polar BEV
(height-sliced occupancy over 40 rings x 120 sectors) is collapsed over
height (the reference's passthrough variant, `DiSCO.py:321-334`; the
learned UNet front-end is an optional refinement), 2D-FFT'd, and the
fftshifted magnitude's central crop is the 1024-d place signature —
rotation of the scene circularly shifts the sector axis, which only
changes the FFT phase, so the magnitude is rotation-invariant.

Relative yaw between two places comes from phase correlation of the
stored spectra (`calcRelOri`, `global_manager.cpp:2719-2762`: ifft of
the normalized cross-spectrum, argmax bin x sector width).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiscoParams(NamedTuple):
    n_rings: int = 40
    n_sectors: int = 120
    z_bins: int = 20
    sig_rows: int = 32   # central crop: sig_rows x sig_cols = 1024
    sig_cols: int = 32


class DiscoDescriptor(NamedTuple):
    signature: jax.Array  # (1024,) rotation-invariant
    spectrum: jax.Array   # (n_rings, n_sectors) complex64 — for yaw


@partial(jax.jit, static_argnames=("params",))
def describe(polar_bev: jax.Array, params: DiscoParams = DiscoParams()) -> DiscoDescriptor:
    """polar_bev: (z_bins, n_rings, n_sectors) occupancy."""
    img = jnp.sum(polar_bev, axis=0)  # passthrough height collapse
    spec = jnp.fft.fft2(img)
    mag = jnp.fft.fftshift(jnp.abs(spec))
    r0 = (params.n_rings - params.sig_rows) // 2
    c0 = (params.n_sectors - params.sig_cols) // 2
    crop = jax.lax.dynamic_slice(
        mag, (r0, c0), (params.sig_rows, params.sig_cols)
    )
    sig = crop.reshape(-1)
    sig = sig / jnp.maximum(jnp.linalg.norm(sig), 1e-9)
    return DiscoDescriptor(signature=sig, spectrum=spec)


@jax.jit
def distance(query_sig: jax.Array, db_sigs: jax.Array, db_mask: jax.Array):
    """L2 distances (D,) of one query signature against the database —
    the kd-tree KNN of `detectLoopClosure` (`global_manager.cpp:
    993-1189`) as one matvec; invalid entries +inf."""
    d = jnp.linalg.norm(db_sigs - query_sig[None, :], axis=-1)
    return jnp.where(db_mask, d, jnp.inf)


@jax.jit
def relative_yaw(query_spec: jax.Array, cand_spec: jax.Array):
    """Phase correlation between stored spectra -> (yaw, confidence).

    cross = Q * conj(C) / |Q * conj(C)|; ifft2 peaks at the circular
    sector shift between the two BEVs. Sector width = 2 pi / n_sectors
    (3 degrees at 120 sectors, `calcRelOri` ifft2 argmax x 3 deg/bin).
    """
    n_sectors = query_spec.shape[-1]
    cross = query_spec * jnp.conj(cand_spec)
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-9)
    surface = jnp.fft.ifft2(cross).real  # (R, S)
    flat = jnp.argmax(surface)
    shift_s = flat % n_sectors
    # signed shift
    shift = jnp.where(shift_s >= n_sectors // 2, shift_s - n_sectors, shift_s)
    yaw = shift.astype(jnp.float32) * (2 * jnp.pi / n_sectors)
    conf = jnp.max(surface) - jnp.mean(surface)
    return yaw, conf
