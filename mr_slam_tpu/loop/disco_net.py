"""Learned DiSCO: UNet feature extractor + differentiable descriptor.

Re-design of `disco_ros/models/DiSCO.py` (UNet over the multi-height
polar BEV -> 2D FFT magnitude -> fftshift -> 1024-d descriptor, plus the
`Corr2Softmax` learned phase-correlation temperature `:337`) and the
quadruplet-loss training loop of `train_DiSCO.py` / `loss/
loss_function.py` — in flax/optax instead of torch. The descriptor head
shares `disco.describe`'s FFT pipeline so a trained network drops into
the same retrieval path as the passthrough variant.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from . import disco


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.gelu(x)


class UNet(nn.Module):
    """Small UNet over the polar BEV (rings x sectors x z_bins), output
    one fused channel (`DiSCO.py`'s feature extractor)."""

    base: int = 16

    @nn.compact
    def __call__(self, x):  # (R, S, C)
        x = x[None]  # add batch
        e1 = ConvBlock(self.base)(x)
        d1 = nn.avg_pool(e1, (2, 2), (2, 2))
        e2 = ConvBlock(self.base * 2)(d1)
        d2 = nn.avg_pool(e2, (2, 2), (2, 2))
        b = ConvBlock(self.base * 4)(d2)
        u2 = jax.image.resize(b, e2.shape[:1] + e2.shape[1:3] + b.shape[3:], "bilinear")
        u2 = ConvBlock(self.base * 2)(jnp.concatenate([u2, e2], axis=-1))
        u1 = jax.image.resize(u2, e1.shape[:1] + e1.shape[1:3] + u2.shape[3:], "bilinear")
        u1 = ConvBlock(self.base)(jnp.concatenate([u1, e1], axis=-1))
        out = nn.Conv(1, (1, 1))(u1)
        return out[0, :, :, 0]  # (R, S)


class Corr2Softmax(nn.Module):
    """Learned affine temperature for phase-correlation logits
    (`DiSCO.py:337`): softmax(a * corr + b) concentrates the yaw
    distribution."""

    @nn.compact
    def __call__(self, corr):
        a = self.param("scale", lambda k: jnp.float32(10.0))
        b = self.param("bias", lambda k: jnp.float32(0.0))
        return jax.nn.softmax(a * corr + b, axis=-1)


class DiscoNet(nn.Module):
    params_cfg: disco.DiscoParams = disco.DiscoParams()
    base: int = 16

    @nn.compact
    def __call__(self, polar_bev):  # (z_bins, R, S)
        img = jnp.moveaxis(polar_bev, 0, -1)  # (R, S, C)
        feat = UNet(self.base)(img)           # (R, S)
        spec = jnp.fft.fft2(feat)
        mag = jnp.fft.fftshift(jnp.abs(spec))
        p = self.params_cfg
        r0 = (p.n_rings - p.sig_rows) // 2
        c0 = (p.n_sectors - p.sig_cols) // 2
        crop = jax.lax.dynamic_slice(mag, (r0, c0), (p.sig_rows, p.sig_cols))
        sig = crop.reshape(-1)
        return sig / jnp.maximum(jnp.linalg.norm(sig), 1e-9)


def quadruplet_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negatives: jax.Array,   # (K, D)
    other_neg: jax.Array,
    margin1: float = 0.5,
    margin2: float = 0.2,
) -> jax.Array:
    """`loss/loss_function.py` quadruplet: hinge(d(a,p) - d(a,n) + m1)
    + hinge(d(a,p) - d(n*, n) + m2) with lazy (max over negatives)
    semantics, as used by train_DiSCO."""
    d_pos = jnp.sum((anchor - positive) ** 2)
    d_neg = jnp.sum((anchor[None] - negatives) ** 2, axis=-1)
    d_on = jnp.sum((other_neg[None] - negatives) ** 2, axis=-1)
    l1 = jnp.max(jax.nn.relu(margin1 + d_pos - d_neg))
    l2 = jnp.max(jax.nn.relu(margin2 + d_pos - d_on))
    return l1 + l2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(
    key: jax.Array,
    model: DiscoNet,
    sample_bev: jax.Array,
    lr: float = 1e-3,
):
    params = model.init(key, sample_bev)
    tx = optax.adam(lr)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0)), tx


@partial(jax.jit, static_argnames=("model", "tx"))
def train_step(
    state: TrainState,
    model: DiscoNet,
    tx,
    anchor_bev: jax.Array,     # (z, R, S)
    positive_bev: jax.Array,
    negative_bevs: jax.Array,  # (K, z, R, S)
    other_neg_bev: jax.Array,
):
    def loss_fn(params):
        f = lambda b: model.apply(params, b)
        a = f(anchor_bev)
        p = f(positive_bev)
        ns = jax.vmap(f)(negative_bevs)
        on = f(other_neg_bev)
        return quadruplet_loss(a, p, ns, on)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
