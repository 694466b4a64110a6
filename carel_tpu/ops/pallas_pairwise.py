"""Fused Pallas TPU kernels for the MMD / HSIC disentanglement statistics.

One kernel computes the whole statistic — Gram blocks, RBF kernels, masked
reductions — entirely in VMEM (B <= 1024, latent dim padded to one 128-lane
tile), with an analytic backward kernel that rematerializes the Gram blocks
instead of storing [B, B] residuals. Numerics match carel_tpu.ops.pairwise
(which matches the reference's torch formulas, flagship :537-596,
drl_classifier_ec_hsic.py:529-547).

Masking strategy: the kernels take a [B, 1] mask column and zero invalid
pairs directly in the Gram blocks (a sentinel-row scheme was tried first but
f32 cancellation at large norms corrupts the within-sentinel distances).
Masked rows therefore contribute nothing to values or gradients.

On CPU the kernels run in interpreter mode automatically (tests exercise both
paths; the TPU path is exercised by bench/production).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_inputs(x: jnp.ndarray, y: jnp.ndarray,
                mask: Optional[jnp.ndarray]):
    """Zero-pad B to sublane and d to lane tiles; mask marks real rows."""
    B, d = x.shape
    if mask is None:
        mask = jnp.ones((B,), jnp.float32)
    mask = mask.astype(jnp.float32)
    Bp = int(-(-B // 8) * 8)
    dp = int(-(-d // _LANE) * _LANE)
    xp = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, dp - d)))
    yp = jnp.pad(y.astype(jnp.float32), ((0, Bp - B), (0, dp - d)))
    mcol = jnp.pad(mask, (0, Bp - B))[:, None]
    n = jnp.sum(mask)
    return xp, yp, mcol, n


def _d2(a, b):
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True)
    return na + nb.T - 2.0 * jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _mmd_fwd_kernel(x_ref, y_ref, m_ref, scal_ref, out_ref, *, alphas):
    x = x_ref[:]
    y = y_ref[:]
    m = m_ref[:]  # [B, 1] mask column
    n = scal_ref[0]
    B = x.shape[0]
    mm = m * m.T

    def ksum(d2):
        pd2 = _EPS + jnp.abs(d2)
        k = jnp.zeros_like(pd2)
        for a in alphas:
            k = k + jnp.exp(-a * pd2)
        return k

    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    offdiag = (rows != cols).astype(jnp.float32)

    s_xy = jnp.sum(ksum(_d2(x, y)) * mm)
    s_xx = jnp.sum(ksum(_d2(x, x)) * mm * offdiag)
    s_yy = jnp.sum(ksum(_d2(y, y)) * mm * offdiag)

    a00 = 1.0 / (n * (n - 1.0))
    a01 = -1.0 / (n * n)
    out_ref[0, 0] = 2.0 * a01 * s_xy + a00 * s_xx + a00 * s_yy


def _mmd_bwd_kernel(x_ref, y_ref, m_ref, scal_ref, dx_ref, dy_ref, *, alphas):
    x = x_ref[:]
    y = y_ref[:]
    m = m_ref[:]
    n = scal_ref[0]
    g = scal_ref[1]
    B = x.shape[0]
    mm = m * m.T

    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    offdiag = (rows != cols).astype(jnp.float32)

    a00 = 1.0 / (n * (n - 1.0))
    a01 = -1.0 / (n * n)

    def cmat(d2, weight):
        # d(sum_a exp(-a*(eps+|d2|)))/d(d2), times the estimator weight
        pd2 = _EPS + jnp.abs(d2)
        c = jnp.zeros_like(pd2)
        for a in alphas:
            c = c + (-a) * jnp.exp(-a * pd2)
        return weight * c * jnp.sign(d2)

    c_xy = cmat(_d2(x, y), g * 2.0 * a01) * mm
    c_xx = cmat(_d2(x, x), g * a00) * mm * offdiag
    c_yy = cmat(_d2(y, y), g * a00) * mm * offdiag

    def matvec(c, b):
        return jax.lax.dot_general(
            c, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    row_xy = jnp.sum(c_xy, axis=1, keepdims=True)
    col_xy = jnp.sum(c_xy, axis=0, keepdims=True).T
    row_xx = jnp.sum(c_xx, axis=1, keepdims=True)
    row_yy = jnp.sum(c_yy, axis=1, keepdims=True)

    # d(d2_ij)/dx_i = 2(x_i - y_j); within-block matrices are symmetric so
    # the i-as-first and i-as-second contributions double.
    dx_ref[:] = 2.0 * (row_xy * x - matvec(c_xy, y)) \
        + 4.0 * (row_xx * x - matvec(c_xx, x))
    dy_ref[:] = 2.0 * (col_xy * y - matvec(c_xy.T, x)) \
        + 4.0 * (row_yy * y - matvec(c_yy, y))


def _mmd_call_fwd(xp, yp, mcol, n, alphas):
    scal = jnp.stack([n, jnp.float32(0.0)])
    out = pl.pallas_call(
        functools.partial(_mmd_fwd_kernel, alphas=alphas),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(xp, yp, mcol, scal)
    return out[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mmd_core(x, y, alphas, mask):
    xp, yp, mcol, n = _pad_inputs(x, y, mask)
    return _mmd_call_fwd(xp, yp, mcol, n, alphas)


def _mmd_core_fwd(x, y, alphas, mask):
    xp, yp, mcol, n = _pad_inputs(x, y, mask)
    out = _mmd_call_fwd(xp, yp, mcol, n, alphas)
    return out, (xp, yp, mcol, n, x.shape)


def _mmd_core_bwd(alphas, res, g):
    xp, yp, mcol, n, shape = res
    B, d = shape
    scal = jnp.stack([n, jnp.float32(g)])
    dx, dy = pl.pallas_call(
        functools.partial(_mmd_bwd_kernel, alphas=alphas),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct(yp.shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(xp, yp, mcol, scal)
    return dx[:B, :d], dy[:B, :d], None


_mmd_core.defvjp(_mmd_core_fwd, _mmd_core_bwd)


def mmd_pallas(x: jnp.ndarray, y: jnp.ndarray,
               alphas: Tuple[float, ...] = (0.1,),
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused unbiased-MMD^2 (forward + analytic backward) on TPU."""
    return _mmd_core(x, y, tuple(float(a) for a in alphas), mask)


# --------------------------- HSIC ---------------------------


def _hsic_fwd_kernel(x_ref, y_ref, m_ref, scal_ref, out_ref, *, s_x, s_y):
    x = x_ref[:]
    y = y_ref[:]
    m = m_ref[:]  # [B, 1] mask column
    n = scal_ref[0]

    K = jnp.exp(-_d2(x, x) / s_x) * (m * m.T)
    L = jnp.exp(-_d2(y, y) / s_y) * (m * m.T)

    def center(A):
        # H A H with H = diag(m) - m m^T / n; A already has masked rows/cols
        # zeroed so diag(m) A diag(m) = A
        rs = jnp.sum(A, axis=1, keepdims=True)  # A m
        cs = jnp.sum(A, axis=0, keepdims=True)  # m^T A
        tot = jnp.sum(A)
        return (A - (m * cs) / n - (rs * m.T) / n
                + (m * m.T) * (tot / (n * n)))

    Kc = center(K)
    Lc = center(L)
    out_ref[0, 0] = jnp.sum(Kc * Lc) / ((n - 1.0) * (n - 1.0))


def _hsic_bwd_kernel(x_ref, y_ref, m_ref, scal_ref, dx_ref, dy_ref,
                     *, s_x, s_y):
    x = x_ref[:]
    y = y_ref[:]
    m = m_ref[:]
    n = scal_ref[0]
    g = scal_ref[1]

    mm = m * m.T
    K = jnp.exp(-_d2(x, x) / s_x) * mm
    L = jnp.exp(-_d2(y, y) / s_y) * mm

    def center(A):
        rs = jnp.sum(A, axis=1, keepdims=True)
        cs = jnp.sum(A, axis=0, keepdims=True)
        tot = jnp.sum(A)
        return (A - (m * cs) / n - (rs * m.T) / n + mm * (tot / (n * n)))

    scale = g / ((n - 1.0) * (n - 1.0))
    # d hsic / dK = H (H L H) H = center(center(L)) (all masked);
    # same for L with K.
    G_K = center(center(L)) * scale
    G_L = center(center(K)) * scale

    def dgram(G, Kmat, z, s):
        W = (G * Kmat) * (-2.0 / s) * 2.0
        rw = jnp.sum(W, axis=1, keepdims=True)
        return rw * z - jax.lax.dot_general(
            W, z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    dx_ref[:] = dgram(G_K, K, x, s_x)
    dy_ref[:] = dgram(G_L, L, y, s_y)


def _hsic_pad(x, y, mask):
    B, d = x.shape
    if mask is None:
        mask = jnp.ones((B,), jnp.float32)
    mask = mask.astype(jnp.float32)
    Bp = int(-(-B // 8) * 8)
    dp = int(-(-d // _LANE) * _LANE)
    x = jnp.pad(x.astype(jnp.float32), ((0, Bp - B), (0, dp - d)))
    y = jnp.pad(y.astype(jnp.float32), ((0, Bp - B), (0, dp - d)))
    mcol = jnp.pad(mask, (0, Bp - B))[:, None]
    n = jnp.sum(mask)
    return x, y, mcol, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hsic_core(x, y, s_x, s_y, mask):
    xp, yp, mcol, n = _hsic_pad(x, y, mask)
    return _hsic_call_fwd(xp, yp, mcol, n, s_x, s_y)


def _hsic_call_fwd(xp, yp, mcol, n, s_x, s_y):
    scal = jnp.stack([n, jnp.float32(0.0)])
    out = pl.pallas_call(
        functools.partial(_hsic_fwd_kernel, s_x=s_x, s_y=s_y),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(xp, yp, mcol, scal)
    return out[0, 0]


def _hsic_core_fwd(x, y, s_x, s_y, mask):
    xp, yp, mcol, n = _hsic_pad(x, y, mask)
    out = _hsic_call_fwd(xp, yp, mcol, n, s_x, s_y)
    return out, (xp, yp, mcol, n, x.shape, mask)


def _hsic_core_bwd(s_x, s_y, res, g):
    xp, yp, mcol, n, shape, mask = res
    B, d = shape
    scal = jnp.stack([n, jnp.float32(g)])
    dx, dy = pl.pallas_call(
        functools.partial(_hsic_bwd_kernel, s_x=s_x, s_y=s_y),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct(yp.shape, jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(xp, yp, mcol, scal)
    dx = dx[:B, :d]
    dy = dy[:B, :d]
    if mask is not None:
        dx = dx * mask.astype(jnp.float32)[:, None]
        dy = dy * mask.astype(jnp.float32)[:, None]
    return dx, dy, None


_hsic_core.defvjp(_hsic_core_fwd, _hsic_core_bwd)


def hsic_pallas(x: jnp.ndarray, y: jnp.ndarray, s_x: float = 1.0,
                s_y: float = 1.0,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused HSIC (forward + analytic backward) on TPU."""
    return _hsic_core(x, y, float(s_x), float(s_y), mask)
