"""Pallas kernel parity: values and gradients vs the XLA reference impls.

On CPU the kernels run in interpreter mode; the same code path compiles via
Mosaic on TPU (exercised by bench/production runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.ops.pairwise import hsic, mmd_statistic
from carel_tpu.ops.pallas_pairwise import hsic_pallas, mmd_pallas


def _data(b=32, d=24, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(loc=0.7, size=(b, d)).astype(np.float32))
    return x, y


def test_mmd_pallas_value_matches_xla():
    x, y = _data()
    want = float(mmd_statistic(x, y, (0.1,)))
    got = float(mmd_pallas(x, y, (0.1,)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_mmd_pallas_multi_alpha_and_nonaligned_batch():
    x, y = _data(b=27, d=24, seed=1)  # 27 not a multiple of 8
    alphas = (0.1, 0.5, 1.0)
    want = float(mmd_statistic(x, y, alphas))
    got = float(mmd_pallas(x, y, alphas))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_mmd_pallas_masked():
    x, y = _data(b=32, seed=2)
    mask = jnp.asarray(
        np.concatenate([np.ones(20), np.zeros(12)]).astype(np.float32))
    want = float(mmd_statistic(x[:20], y[:20], (0.1,)))
    got = float(mmd_pallas(x, y, (0.1,), mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_mmd_pallas_grad_matches_xla():
    x, y = _data(b=16, d=8, seed=3)

    f_ref = lambda a, b: mmd_statistic(a, b, (0.1, 0.3))
    f_pal = lambda a, b: mmd_pallas(a, b, (0.1, 0.3))
    gx_ref, gy_ref = jax.grad(f_ref, argnums=(0, 1))(x, y)
    gx_pal, gy_pal = jax.grad(f_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy_pal), np.asarray(gy_ref),
                               rtol=1e-4, atol=1e-7)


def test_mmd_pallas_grad_masked():
    x, y = _data(b=16, d=8, seed=4)
    mask = jnp.asarray(
        np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32))

    f_ref = lambda a, b: mmd_statistic(a, b, (0.1,), mask=mask)
    f_pal = lambda a, b: mmd_pallas(a, b, (0.1,), mask)
    gx_ref, gy_ref = jax.grad(f_ref, argnums=(0, 1))(x, y)
    gx_pal, gy_pal = jax.grad(f_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-7)
    # masked rows carry no gradient
    assert float(jnp.abs(gx_pal[10:]).max()) == 0.0


def test_hsic_pallas_value_matches_xla():
    x, y = _data(b=24, d=8, seed=5)
    want = float(hsic(x, y, 1.0, 1.0))
    got = float(hsic_pallas(x, y, 1.0, 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_hsic_pallas_masked_value():
    x, y = _data(b=24, d=8, seed=6)
    mask = jnp.asarray(
        np.concatenate([np.ones(17), np.zeros(7)]).astype(np.float32))
    want = float(hsic(x[:17], y[:17], 2.0, 2.0))
    got = float(hsic_pallas(x, y, 2.0, 2.0, mask))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_hsic_pallas_grad_matches_xla():
    x, y = _data(b=16, d=6, seed=7)

    f_ref = lambda a, b: hsic(a, b, 1.5, 0.8)
    f_pal = lambda a, b: hsic_pallas(a, b, 1.5, 0.8)
    gx_ref, gy_ref = jax.grad(f_ref, argnums=(0, 1))(x, y)
    gx_pal, gy_pal = jax.grad(f_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy_pal), np.asarray(gy_ref),
                               rtol=1e-4, atol=1e-7)


def test_registry_pallas_impl_switch():
    from carel_tpu.config import LossConfig, Regularizer
    from carel_tpu.losses.registry import regularizer_loss

    x, y = _data(b=16, d=8, seed=8)
    out = {"z_emotion": x, "z_cause": y}
    for reg, w in [(Regularizer.MMD, None), (Regularizer.HSIC, None)]:
        cfg = LossConfig(regularizer=reg)
        a = float(regularizer_loss(out, cfg, impl="xla"))
        b = float(regularizer_loss(out, cfg, impl="pallas"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
