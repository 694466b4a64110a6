"""Plain (non-VAE) pair classifier: encoder pooler -> dropout -> linear.

Reference: PairClassifier (/root/reference/pair_classifier.py:68-84), the
baseline used by pair_inference.py and mc_classifier.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from carel_tpu.config import EncoderConfig
from carel_tpu.models.encoder import TransformerEncoder


class PairClassifierModel(nn.Module):
    encoder_cfg: EncoderConfig
    dropout: float = 0.3

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True):
        _, pooled = TransformerEncoder(self.encoder_cfg, name="encoder")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic)
        x = nn.Dropout(self.dropout)(pooled.astype(jnp.float32),
                                     deterministic=deterministic)
        return nn.Dense(1, name="classifier")(x)
