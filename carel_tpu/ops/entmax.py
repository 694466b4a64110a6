"""Sparsemax and 1.5-entmax in JAX (exact, sort-based) with analytic VJPs.

The reference's adapter variants apply Sparsemax / entmax15 from the `entmax`
PyPI package over attention scores
(/root/reference/drl_classifier_ec_mmd_final_mul_newsplit_emnlp.py:212-219,
:263-268). Implemented natively here: a sort over the last axis (fine on TPU
for L<=128 attention rows) plus closed-form Jacobian-vector products, so the
backward pass never differentiates through the sort.

References: Martins & Astudillo 2016 (sparsemax); Peters, Niculae & Martins
2019 (exact alpha=1.5 entmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def sparsemax(z: jnp.ndarray) -> jnp.ndarray:
    """Projection of the last axis onto the probability simplex."""
    return _sparsemax_fwd_impl(z)


def _sparsemax_fwd_impl(z):
    z = z.astype(jnp.float32)
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, z.shape[-1] + 1, dtype=jnp.float32)
    cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = (1.0 + k * z_sorted) > cumsum
    k_z = jnp.sum(support, axis=-1, keepdims=True).astype(jnp.float32)
    # cumsum at the support boundary
    tau_sum = jnp.take_along_axis(
        cumsum, (k_z - 1).astype(jnp.int32), axis=-1
    )
    tau = (tau_sum - 1.0) / k_z
    return jnp.maximum(z - tau, 0.0)


def _sparsemax_fwd(z):
    p = _sparsemax_fwd_impl(z)
    return p, p


def _sparsemax_bwd(p, g):
    s = (p > 0).astype(g.dtype)
    v = g * s
    mean = jnp.sum(v, axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(s, axis=-1, keepdims=True), 1.0
    )
    return ((v - s * mean).astype(p.dtype),)


sparsemax.defvjp(_sparsemax_fwd, _sparsemax_bwd)


@jax.custom_vjp
def entmax15(z: jnp.ndarray) -> jnp.ndarray:
    """Exact alpha=1.5 entmax over the last axis."""
    return _entmax15_fwd_impl(z)


def _entmax15_fwd_impl(z):
    z = z.astype(jnp.float32) / 2.0
    # subtract max for numerical stability (entmax is shift-invariant)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, z.shape[-1] + 1, dtype=jnp.float32)
    mean = jnp.cumsum(z_sorted, axis=-1) / k
    meansq = jnp.cumsum(z_sorted**2, axis=-1) / k
    ss = k * (meansq - mean**2)
    delta = (1.0 - ss) / k
    delta_nz = jnp.maximum(delta, 0.0)
    tau = mean - jnp.sqrt(delta_nz)
    # support: largest k with tau_k <= z_sorted_k
    support = tau <= z_sorted
    k_z = jnp.sum(support, axis=-1, keepdims=True) - 1
    tau_star = jnp.take_along_axis(tau, jnp.maximum(k_z, 0), axis=-1)
    p = jnp.maximum(z - tau_star, 0.0) ** 2
    return p


def _entmax15_fwd(z):
    p = _entmax15_fwd_impl(z)
    return p, p


def _entmax15_bwd(p, g):
    # Jv = d*g - (sum(d*g)/sum(d)) * d with d = sqrt(p); extra 1/2 from the
    # z/2 transform cancels in the standard formulation (see entmax repo).
    d = jnp.sqrt(p).astype(g.dtype)
    dx = g * d
    denom = jnp.sum(d, axis=-1, keepdims=True)
    q = jnp.sum(dx, axis=-1, keepdims=True) / jnp.where(denom == 0, 1.0, denom)
    return ((dx - q * d).astype(p.dtype),)


entmax15.defvjp(_entmax15_fwd, _entmax15_bwd)
