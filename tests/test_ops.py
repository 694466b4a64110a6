"""Kernel/op tests against closed-form and torch-based oracles.

torch (CPU) is available in the dev environment, so MMD/HSIC are checked
directly against a transcription of the reference's torch formulas — the
strongest possible parity evidence without running the reference trainer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carel_tpu.ops.bow_recon import bow_reconstruction_loss, densify_bow
from carel_tpu.ops.entmax import entmax15, sparsemax
from carel_tpu.ops.pairwise import hsic, mmd_statistic, pdist


def torch_mmd_oracle(x, y, alphas):
    """Direct numpy transcription of MMDStatistic + pdist
    (flagship :537-596)."""
    n1, n2 = len(x), len(y)
    a00 = 1.0 / (n1 * (n1 - 1))
    a11 = 1.0 / (n2 * (n2 - 1))
    a01 = -1.0 / (n1 * n2)
    s = np.concatenate([x, y], 0)
    norms = (s**2).sum(1)
    d2 = norms[:, None] + norms[None, :] - 2 * s @ s.T
    d = np.sqrt(1e-5 + np.abs(d2))
    k = sum(np.exp(-a * d**2) for a in alphas)
    k1, k2, k12 = k[:n1, :n1], k[n1:, n1:], k[:n1, n1:]
    return (2 * a01 * k12.sum() + a00 * (k1.sum() - np.trace(k1))
            + a11 * (k2.sum() - np.trace(k2)))


def numpy_hsic_oracle(x, y, sx=1.0, sy=1.0):
    m = len(x)

    def gram(z, s):
        n = (z**2).sum(1)
        d2 = n[:, None] + n[None, :] - 2 * z @ z.T
        return np.exp(-d2 / s)

    K, L = gram(x, sx), gram(y, sy)
    H = np.eye(m) - np.ones((m, m)) / m
    return np.trace(L @ H @ K @ H) / ((m - 1) ** 2)


def test_pdist_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 24)).astype(np.float32)
    d = np.asarray(pdist(jnp.asarray(x), jnp.asarray(x)))
    norms = (x**2).sum(1)
    d2 = norms[:, None] + norms[None, :] - 2 * x @ x.T
    ref = np.sqrt(1e-5 + np.abs(d2))
    # atol covers f32 cancellation noise on near-zero distances, which the
    # numpy oracle itself suffers from with a different summation order
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=3e-3)


def test_mmd_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 24)).astype(np.float32)
    y = rng.normal(loc=1.5, size=(32, 24)).astype(np.float32)
    got = float(mmd_statistic(jnp.asarray(x), jnp.asarray(y), (0.1,)))
    want = torch_mmd_oracle(x, y, [0.1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # identical samples => ~0; shifted samples => clearly positive
    same = float(mmd_statistic(jnp.asarray(x), jnp.asarray(x), (0.1,)))
    assert got > same


def test_mmd_mask_equals_short_batch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(24, 8)).astype(np.float32)
    y = rng.normal(size=(24, 8)).astype(np.float32)
    # pad to 32 with garbage; mask out the tail
    pad = lambda a: np.concatenate([a, 99 * np.ones((8, 8), np.float32)])
    mask = np.concatenate([np.ones(24), np.zeros(8)]).astype(np.float32)
    got = float(mmd_statistic(jnp.asarray(pad(x)), jnp.asarray(pad(y)),
                              (0.1,), mask=jnp.asarray(mask)))
    want = torch_mmd_oracle(x, y, [0.1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hsic_matches_reference_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 24)).astype(np.float32)
    y = (x * 0.8 + rng.normal(size=(20, 24)) * 0.1).astype(np.float32)
    got = float(hsic(jnp.asarray(x), jnp.asarray(y)))
    want = numpy_hsic_oracle(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # dependence check needs low dim: in 24-d with sigma=1 all off-diagonal
    # kernels vanish and HSIC degenerates to 1/(m-1) regardless of inputs
    x2 = rng.normal(size=(24, 2)).astype(np.float32)
    y2 = (x2 + rng.normal(size=(24, 2)) * 0.05).astype(np.float32)
    z2 = rng.normal(size=(24, 2)).astype(np.float32)
    dep = float(hsic(jnp.asarray(x2), jnp.asarray(y2), 2.0, 2.0))
    indep = float(hsic(jnp.asarray(x2), jnp.asarray(z2), 2.0, 2.0))
    assert dep > indep


def test_hsic_mask_equals_short_batch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(12, 6)).astype(np.float32)
    y = rng.normal(size=(12, 6)).astype(np.float32)
    pad = lambda a: np.concatenate([a, 7 * np.ones((4, 6), np.float32)])
    mask = np.concatenate([np.ones(12), np.zeros(4)]).astype(np.float32)
    got = float(hsic(jnp.asarray(pad(x)), jnp.asarray(pad(y)),
                     mask=jnp.asarray(mask)))
    want = numpy_hsic_oracle(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_sparsemax_properties():
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32)) * 3
    p = sparsemax(z)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(p) >= 0)
    # sparsemax of a one-hot-dominant vector is sparse
    z2 = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    p2 = np.asarray(sparsemax(z2))
    np.testing.assert_allclose(p2, [[1, 0, 0, 0]], atol=1e-6)
    # uniform input -> uniform output
    p3 = np.asarray(sparsemax(jnp.zeros((1, 5))))
    np.testing.assert_allclose(p3, 0.2, rtol=1e-6)


def test_sparsemax_grad_matches_finite_diff():
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    f = lambda v: jnp.sum(sparsemax(v[None, :]) * jnp.arange(8.0))
    g = jax.grad(f)(z)
    eps = 1e-3
    for i in range(8):
        dz = np.zeros(8, np.float32)
        dz[i] = eps
        num = (f(z + dz) - f(z - dz)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(num), atol=5e-3)


def test_entmax15_properties():
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.normal(size=(4, 12)).astype(np.float32)) * 2
    p = entmax15(z)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-4)
    assert np.all(np.asarray(p) >= 0)
    # entmax15 is sparser than softmax but denser than sparsemax on the
    # same logits
    sm = np.asarray(jax.nn.softmax(z, -1))
    ent = np.asarray(p)
    spm = np.asarray(sparsemax(z))
    assert (ent == 0).sum() >= (sm < 1e-6).sum()
    assert (ent == 0).sum() <= (spm == 0).sum()


def test_entmax15_grad_matches_finite_diff():
    rng = np.random.default_rng(8)
    z = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    f = lambda v: jnp.sum(entmax15(v[None, :]) * w)
    g = jax.grad(f)(z)
    eps = 1e-3
    for i in range(6):
        dz = np.zeros(6, np.float32)
        dz[i] = eps
        num = (f(z + dz) - f(z - dz)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(num), atol=5e-3)


def test_densify_and_recon_loss():
    idx = jnp.asarray([[0, 2, -1], [1, -1, -1]], jnp.int32)
    w = jnp.asarray([[0.5, 0.5, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    dense = np.asarray(densify_bow(idx, w, 4))
    np.testing.assert_allclose(dense, [[0.5, 0, 0.5, 0], [0, 1, 0, 0]])

    logits = jnp.zeros((2, 4), jnp.float32)
    loss = bow_reconstruction_loss(logits, idx, w, label_smoothing=0.1)
    # oracle: BCE(softmax(0)=0.25, target)
    target = dense * 0.9 + 0.1 / 4
    p = 0.25
    bce = -(target * np.log(p) + (1 - target) * np.log(1 - p))
    np.testing.assert_allclose(float(loss), bce.mean(), rtol=1e-5)

    # masked: second row ignored
    m = jnp.asarray([1.0, 0.0])
    loss_m = bow_reconstruction_loss(logits, idx, w, 0.1, m)
    np.testing.assert_allclose(float(loss_m), bce[0].mean(), rtol=1e-5)


def test_mmd_permutation_test():
    from carel_tpu.ops.pairwise import mmd_permutation_test

    rng = np.random.default_rng(11)
    # same distribution -> high p-value; shifted -> tiny p-value
    x = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
    y_same = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
    y_diff = jnp.asarray(rng.normal(loc=2.0, size=(24, 8)).astype(np.float32))
    m1, p1 = mmd_permutation_test(x, y_same, (0.1,), 200, jax.random.key(0))
    m2, p2 = mmd_permutation_test(x, y_diff, (0.1,), 200, jax.random.key(0))
    assert float(p1) > 0.05
    assert float(p2) < 0.05
    assert float(m2) > float(m1)
    # observed statistic matches mmd_statistic exactly
    np.testing.assert_allclose(float(m1),
                               float(mmd_statistic(x, y_same, (0.1,))),
                               rtol=1e-5, atol=1e-7)
