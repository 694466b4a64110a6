"""Train state: parameters + the reference's multi-optimizer layout.

The reference runs up to three optimizers per variant (SURVEY.md §2.2):
Adam(vae_lr) over encoder/decoder/classifiers, RMSprop(adv_lr) over the GAN
discriminators, Adam(aprx_lr) over the CLUB net. Here each group is an
independently-masked optax transform with its own state, so the GAN and VI
steps can apply them in the reference's sequence inside one jitted step
(disc+main together from one grad tree; club phase-1 then main phase-2 for
VI, matching vi_final :760-781).

Parity quirk: the reference's main optimizer NEVER includes the four latent
projection layers (emotion/cause mu/log_var are absent from get_params,
flagship :284-297) — they stay at random init for the whole run. That exact
behavior is the default (compat_frozen_latent_heads=True); setting it False
trains them with the main Adam.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from carel_tpu.config import CarelConfig

MAIN, DISC, CLUB, FROZEN = "main", "disc", "club", "frozen"


def param_labels(params: Any, compat_frozen_latent_heads: bool = True) -> Any:
    """Label each leaf by optimizer group based on its module path."""

    def label_for(path) -> str:
        keys = [getattr(p, "key", None) for p in path]
        if "ec_disc" in keys or "ce_disc" in keys:
            return DISC
        if "club" in keys:
            return CLUB
        if compat_frozen_latent_heads and any(
            k in ("emotion_mu", "emotion_log_var", "cause_mu", "cause_log_var")
            for k in keys
        ):
            return FROZEN
        return MAIN

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_for(path), params
    )


def _group_mask(labels: Any, group: str) -> Any:
    return jax.tree_util.tree_map(lambda l: l == group, labels)


def _only_group(tx: optax.GradientTransformation, labels: Any,
                group: str) -> optax.GradientTransformation:
    """Apply tx to the group's leaves and ZERO all other updates.

    optax.masked alone passes unmasked leaves through unchanged (raw grads
    would be applied); the complement must be explicitly zeroed.
    """
    mask = _group_mask(labels, group)
    inv = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), inv),
    )


class TrainState(struct.PyTreeNode):
    """Whole-model params plus one masked optimizer state per group."""

    step: jnp.ndarray
    params: Any
    main_opt_state: Any
    disc_opt_state: Any
    club_opt_state: Any
    rng: jax.Array
    main_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    club_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_main(self, grads, with_disc: bool = False):
        """Main Adam update (optionally + disc RMSprop from the same grads,
        matching the GAN variant's accumulate-then-step-all ordering)."""
        updates, new_main = self.main_tx.update(
            grads, self.main_opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        new_disc = self.disc_opt_state
        if with_disc:
            d_updates, new_disc = self.disc_tx.update(
                grads, self.disc_opt_state, params)
            params = optax.apply_updates(params, d_updates)
        return self.replace(
            step=self.step + 1, params=params,
            main_opt_state=new_main, disc_opt_state=new_disc)

    def apply_club(self, grads):
        updates, new_club = self.club_tx.update(
            grads, self.club_opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(params=params, club_opt_state=new_club)


def create_train_state(
    cfg: CarelConfig,
    params: Any,
    rng: jax.Array,
    compat_frozen_latent_heads: bool = True,
) -> TrainState:
    """torch defaults replicated: Adam(b1=.9, b2=.999, eps=1e-8),
    RMSprop(alpha=.99, eps=1e-8) (ec_gan :906-909, vi_final :878-879)."""
    labels = param_labels(params, compat_frozen_latent_heads)
    mu_dtype = (jnp.bfloat16 if cfg.train.optim_mu_dtype == "bfloat16"
                else None)
    main_tx = _only_group(
        optax.adam(cfg.train.vae_lr, eps=1e-8, mu_dtype=mu_dtype),
        labels, MAIN)
    disc_tx = _only_group(
        optax.rmsprop(cfg.train.adv_lr, decay=0.99, eps=1e-8), labels, DISC)
    club_tx = _only_group(optax.adam(cfg.train.aprx_lr, eps=1e-8), labels, CLUB)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        main_opt_state=main_tx.init(params),
        disc_opt_state=disc_tx.init(params),
        club_opt_state=club_tx.init(params),
        rng=rng,
        main_tx=main_tx,
        disc_tx=disc_tx,
        club_tx=club_tx,
    )
