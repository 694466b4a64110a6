"""Deep-embedded clustering over clause embeddings, in JAX.

The reference's ECPE_discovery.py / run_DCC_pairwise.py depend on a `lib/`
package (IDEC / DCC) that is ABSENT from its repo — they are unrunnable as
archived (SURVEY.md §2.9). This module provides a working equivalent:

- a [500, 500, 2000] -> z autoencoder (the IDEC geometry, ECPE_discovery.py
  :10-30) pretrained with MSE;
- DEC/IDEC refinement: Student-t soft assignments against K-means-initialized
  centroids, sharpened-target KL objective, plus the reconstruction term
  (IDEC) and optional must-link/cannot-link pairwise penalties (the DCC
  variant, run_DCC_pairwise.py's objective);
- the chi-squared contingency test between cluster assignment and emotion
  label that ECPE_discovery runs on the result.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class AutoEncoder(nn.Module):
    z_dim: int = 10
    hidden: Tuple[int, ...] = (500, 500, 2000)

    @nn.compact
    def __call__(self, x):
        h = x
        for i, d in enumerate(self.hidden):
            h = nn.relu(nn.Dense(d, name=f"enc_{i}")(h))
        z = nn.Dense(self.z_dim, name="z")(h)
        h = z
        for i, d in enumerate(reversed(self.hidden)):
            h = nn.relu(nn.Dense(d, name=f"dec_{i}")(h))
        x_hat = nn.Dense(x.shape[-1], name="out")(h)
        return z, x_hat


def _kmeans(z: np.ndarray, k: int, seed: int = 42, iters: int = 50
            ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = z[rng.choice(len(z), size=min(k, len(z)), replace=False)]
    for _ in range(iters):
        d2 = ((z[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        new = np.stack([
            z[assign == j].mean(0) if (assign == j).any() else centers[j]
            for j in range(len(centers))])
        if np.allclose(new, centers):
            break
        centers = new
    return centers


def _student_t(z, centers, alpha: float = 1.0):
    d2 = jnp.sum((z[:, None, :] - centers[None, :, :]) ** 2, -1)
    q = (1.0 + d2 / alpha) ** (-(alpha + 1.0) / 2.0)
    return q / jnp.sum(q, axis=1, keepdims=True)


def _target_dist(q):
    w = q**2 / jnp.sum(q, axis=0, keepdims=True)
    return w / jnp.sum(w, axis=1, keepdims=True)


@dataclass
class IdecConfig:
    z_dim: int = 10
    n_clusters: int = 25  # ECPE_discovery.py:21
    pretrain_epochs: int = 50
    refine_steps: int = 100
    batch_size: int = 256
    lr: float = 1e-3
    gamma: float = 0.1  # weight of the clustering KL vs reconstruction
    constraint_weight: float = 1.0
    seed: int = 42


def train_idec(
    data: np.ndarray,
    cfg: IdecConfig = IdecConfig(),
    must_link: Optional[np.ndarray] = None,  # [M, 2] index pairs
    cannot_link: Optional[np.ndarray] = None,
    logger=None,
) -> Tuple[np.ndarray, dict]:
    """Cluster assignments + artifacts for clause embeddings [N, D]."""
    data = np.asarray(data, np.float32)
    n = len(data)
    model = AutoEncoder(cfg.z_dim)
    rng = jax.random.key(cfg.seed)
    params = model.init(rng, jnp.asarray(data[:2]))["params"]
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)

    @jax.jit
    def ae_step(params, opt, x):
        def loss_fn(p):
            _, x_hat = model.apply({"params": p}, x)
            return jnp.mean((x_hat - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    drng = np.random.default_rng(cfg.seed)
    for epoch in range(cfg.pretrain_epochs):
        order = drng.permutation(n)
        for s in range(0, n, cfg.batch_size):
            idx = order[s : s + cfg.batch_size]
            params, opt, loss = ae_step(params, opt, jnp.asarray(data[idx]))
        if logger and epoch % 10 == 9:
            logger.log({"event": "idec_pretrain", "epoch": epoch + 1,
                        "mse": float(loss)})

    z0 = np.asarray(model.apply({"params": params}, jnp.asarray(data))[0])
    centers = jnp.asarray(_kmeans(z0, cfg.n_clusters, cfg.seed))

    state = {"params": params, "centers": centers}
    tx2 = optax.adam(cfg.lr)
    opt2 = tx2.init(state)
    ml = jnp.asarray(must_link, jnp.int32) if must_link is not None else None
    cl = (jnp.asarray(cannot_link, jnp.int32)
          if cannot_link is not None else None)

    @jax.jit
    def refine_step(state, opt2, x, target):
        def loss_fn(st):
            z, x_hat = model.apply({"params": st["params"]}, x)
            q = _student_t(z, st["centers"])
            kl = jnp.sum(target * jnp.log(
                jnp.maximum(target, 1e-12) / jnp.maximum(q, 1e-12))) / len(x)
            recon = jnp.mean((x_hat - x) ** 2)
            loss = recon + cfg.gamma * kl
            if ml is not None and len(ml):
                loss = loss + cfg.constraint_weight * jnp.mean(
                    jnp.sum((q[ml[:, 0]] - q[ml[:, 1]]) ** 2, -1))
            if cl is not None and len(cl):
                loss = loss - cfg.constraint_weight * jnp.mean(
                    jnp.sum((q[cl[:, 0]] - q[cl[:, 1]]) ** 2, -1))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state)
        updates, opt2 = tx2.update(grads, opt2, state)
        return optax.apply_updates(state, updates), opt2, loss

    x_all = jnp.asarray(data)
    for step in range(cfg.refine_steps):
        z, _ = model.apply({"params": state["params"]}, x_all)
        q = _student_t(z, state["centers"])
        target = jax.lax.stop_gradient(_target_dist(q))
        state, opt2, loss = refine_step(state, opt2, x_all, target)
        if logger and step % 20 == 19:
            logger.log({"event": "idec_refine", "step": step + 1,
                        "loss": float(loss)})

    z, _ = model.apply({"params": state["params"]}, x_all)
    q = np.asarray(_student_t(z, state["centers"]))
    assign = q.argmax(1)
    return assign, {"q": q, "params": state["params"],
                    "centers": np.asarray(state["centers"])}


def emotion_cluster_chi2(assignments: Sequence[int],
                         emotions: Sequence[int]) -> dict:
    """Chi-squared contingency test between cluster ids and emotion labels
    (ECPE_discovery.py:24-30)."""
    from scipy.stats import chi2_contingency

    assignments = np.asarray(assignments)
    emotions = np.asarray(emotions)
    clusters = np.unique(assignments)
    emos = np.unique(emotions)
    table = np.zeros((len(clusters), len(emos)), np.int64)
    for i, c in enumerate(clusters):
        for j, e in enumerate(emos):
            table[i, j] = int(((assignments == c) & (emotions == e)).sum())
    # drop all-zero rows/cols to keep the test well-defined
    table = table[table.sum(1) > 0][:, table.sum(0) > 0]
    chi2, p, dof, _ = chi2_contingency(table)
    return {"chi2": float(chi2), "p_value": float(p), "dof": int(dof),
            "table": table}
