"""Stage-1 document-level emotion model.

Reference: biLSTM (/root/reference/baseline_emotion_classifier_final_devin.py
:283-329): per-clause encoder pooler -> linear 768->2h -> BiLSTM over the
clause axis -> 7-way softmax per clause, plus L2 reg on the final layer.

The clause batch is folded into the encoder batch ([B, D, S] -> [B*D, S]) so
the encoder runs one big MXU-friendly matmul batch; the BiLSTM is a lax.scan
over the (static) clause axis. A transformer-over-clauses alternative is
available with `clause_mixer="transformer"` — usually both faster and better
on TPU, kept behind a flag for reference parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from carel_tpu.config import EncoderConfig
from carel_tpu.models.encoder import TransformerEncoder


class BiLSTM(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, x):  # [B, D, F]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="bwd",
                     reverse=True, keep_order=True)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class ClauseTransformer(nn.Module):
    hidden_size: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):  # [B, D, F]
        d = 2 * self.hidden_size
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, name="attn")
        x = nn.LayerNorm(name="ln1")(x + attn(x, x))
        h = nn.Dense(2 * d, name="mlp_in")(x)
        h = nn.Dense(d, name="mlp_out")(nn.gelu(h))
        return nn.LayerNorm(name="ln2")(x + h)


class DocEmotionModel(nn.Module):
    encoder_cfg: EncoderConfig
    n_hidden: int = 100
    n_class: int = 7
    keep_softmax: float = 1.0  # dropout keep prob before the final layer
    clause_mixer: str = "bilstm"  # "bilstm" | "transformer"

    @nn.compact
    def __call__(
        self,
        x_ids,  # [B, D, S] int32
        x_masks,  # [B, D, S]
        x_types,  # [B, D, S]
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, D, S = x_ids.shape
        flat = lambda a: a.reshape(B * D, S)
        _, pooled = TransformerEncoder(self.encoder_cfg, name="encoder")(
            flat(x_ids), flat(x_masks), flat(x_types),
            deterministic=deterministic)
        s = pooled.reshape(B, D, -1).astype(jnp.float32)
        s = nn.Dense(2 * self.n_hidden, name="senlayer")(s)
        if self.clause_mixer == "transformer":
            s = ClauseTransformer(self.n_hidden, name="mixer")(s)
        else:
            s = BiLSTM(self.n_hidden, name="mixer")(s)
        s = nn.Dropout(1.0 - self.keep_softmax)(s, deterministic=deterministic)
        final = nn.Dense(self.n_class, name="nnlayer_pos")
        logits = final(s)
        pred = jax.nn.softmax(logits, axis=-1)
        # L2 reg on the final layer's weight and bias norms (devin :327).
        # eps inside the sqrt: d||x||/dx at x=0 is 0/0 = NaN, and flax (unlike
        # torch Linear) initializes the bias to exactly zero — a bare
        # jnp.linalg.norm NaNs every param on the first backward pass.
        def safe_norm(x):
            return jnp.sqrt(jnp.sum(jnp.square(x)) + 1e-12)

        w = self.variables["params"]["nnlayer_pos"]["kernel"] \
            if "params" in self.variables else None
        if w is not None:
            b = self.variables["params"]["nnlayer_pos"]["bias"]
            reg = safe_norm(w) + safe_norm(b)
        else:  # during init
            reg = jnp.asarray(0.0)
        return pred, reg
