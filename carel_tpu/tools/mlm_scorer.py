"""Directional conditional-likelihood scorer from an in-framework MLM.

The reference's ordering_chatyuan.py scores P(target | input) with a
downloaded ChatYuan seq2seq LM (calc_prob, ordering_chatyuan.py:38-66,
optionally length-normalized, :53-55) and compares the two directions of an
emotion-cause pair. Those weights are unobtainable here (zero egress, and
absent from the upstream repo too — SURVEY §2.9), so this provides the same
capability from the framework's OWN MLM-pretrained encoder: each hypothesis
token is masked in turn behind the premise context and the masked-token
log-probabilities are averaged — masked-LM pseudo-log-likelihood (Salazar
et al., "Masked Language Model Scoring", ACL 2020), length-normalized like
the reference's with_length_normalization branch.

Static-shape jit: every (premise, hypothesis) call runs one [hyp_cap,
max_len] batch through the MLM, so the scorer compiles exactly once.

Produce a scoring-capable model with `carel_tpu pretrain --save_mlm <dir>`
(the plain encoder checkpoints drop the MLM head). Plugs into
carel_tpu.tools.ordering.ordering_probe as `entailment_scorer`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from carel_tpu.config import EncoderConfig


class MlmScorer:
    """Callable (premise, hypothesis) -> mean masked-token log-prob."""

    def __init__(self, mlm_dir: str, tokenizer, encoder_cfg: EncoderConfig,
                 max_len: int = 64, hyp_cap: int = 32):
        from carel_tpu.pretrain.mlm import MlmModel, load_encoder

        self.tok = tokenizer
        self.max_len = max_len
        self.hyp_cap = hyp_cap
        self.mask_id = (tokenizer.token_to_id.get("[MASK]", 4)
                        if hasattr(tokenizer, "token_to_id") else 4)
        model = MlmModel(encoder_cfg)
        probe = jnp.zeros((1, max_len), jnp.int32)
        template = model.init({"params": jax.random.key(0)}, probe,
                              jnp.ones_like(probe))["params"]
        params = load_encoder(mlm_dir, template)

        @jax.jit
        def masked_logprobs(ids, attn, pos, tgt):
            logits = model.apply({"params": params}, ids, attn,
                                 deterministic=True)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            rows = jnp.arange(ids.shape[0])
            return logp[rows, pos, tgt]

        self._fn = masked_logprobs

    def __call__(self, premise: str, hypothesis: str) -> float:
        prem = self.tok.tokenize_to_ids(str(premise))
        hyp = self.tok.tokenize_to_ids(str(hypothesis))[: self.hyp_cap]
        base = ([self.tok.cls_id] + prem + [self.tok.sep_id]
                + hyp + [self.tok.sep_id])
        if len(base) > self.max_len:
            base = base[: self.max_len - 1] + [self.tok.sep_id]
        start = len(prem) + 2  # [CLS] prem [SEP] | hyp...
        hyp_pos = list(range(start, min(start + len(hyp), len(base) - 1)))
        if not hyp_pos:  # premise filled the window; direction unscorable
            return float("-inf")

        H, L = self.hyp_cap, self.max_len
        row = np.full(L, self.tok.pad_id, np.int32)
        row[: len(base)] = base
        amask = np.zeros(L, np.int32)
        amask[: len(base)] = 1
        ids = np.tile(row, (H, 1))
        attn = np.tile(amask, (H, 1))
        pos = np.zeros(H, np.int32)
        tgt = np.zeros(H, np.int32)
        for j, p in enumerate(hyp_pos):
            tgt[j] = row[p]
            ids[j, p] = self.mask_id
            pos[j] = p
        lp = np.asarray(self._fn(jnp.asarray(ids), jnp.asarray(attn),
                                 jnp.asarray(pos), jnp.asarray(tgt)))
        return float(lp[: len(hyp_pos)].mean())
