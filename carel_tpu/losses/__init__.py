from carel_tpu.losses.vae import kl_loss, annealed_kl_weight, reconstruction_loss  # noqa: F401
from carel_tpu.losses.classify import (  # noqa: F401
    emotion_ce_loss,
    binary_smoothed_bce,
    cause_bce_loss,
    pair_bce_pos_weighted,
    entropy_loss,
)
from carel_tpu.losses.registry import regularizer_loss, club_aprx_loss, club_upper_loss  # noqa: F401
