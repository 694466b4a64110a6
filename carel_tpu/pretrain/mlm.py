"""Masked-language-model pretraining for the encoder.

The reference's results depend on downloaded pretrained encoders
(`hfl/chinese-roberta-wwm-ext` / `roberta-base`, flagship :63-71); the TPU
environment has no network egress, so this module bootstraps an encoder
in-framework: BERT-recipe MLM (15% positions; 80% [MASK] / 10% random /
10% kept) over the ECPE corpora, with a tied-embedding output head, linear
warmup, and bf16 MXU matmuls. Pretrained encoder params are saved with orbax
and plug into the task pipeline via ModelConfig.pretrained_encoder (orbax
directories are detected alongside HF checkpoint directories).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from carel_tpu.config import EncoderConfig
from carel_tpu.models.encoder import TransformerEncoder


class MlmModel(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        encoder = TransformerEncoder(self.cfg, name="encoder")
        hidden, _ = encoder(input_ids, attention_mask, None,
                            deterministic=deterministic)
        h = hidden.astype(jnp.float32)
        h = nn.Dense(self.cfg.hidden_dim, name="mlm_transform")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(name="mlm_ln")(h)
        # untied output projection (the head is discarded after pretraining,
        # so weight tying buys nothing here)
        return nn.Dense(self.cfg.vocab_size, name="mlm_output")(h)


@dataclass(frozen=True)
class MlmConfig:
    batch_size: int = 256
    seq_len: int = 64
    steps: int = 2000
    warmup_steps: int = 200
    learning_rate: float = 1e-4
    mask_prob: float = 0.15
    seed: int = 42
    # steps fused into one dispatch via lax.scan with the tokenized corpus
    # resident on device — the naive one-dispatch-per-step loop is host-
    # latency-bound through the TPU tunnel (~9 steps/s vs the chip's ~100/s)
    scan_size: int = 50
    # whole-word masking: mask decisions are shared across all tokens of a
    # word (jieba words for the zh char tokenizer; "##"-joined pieces for
    # WordPiece) — the recipe behind `hfl/chinese-roberta-wwm-ext`, the
    # encoder the reference downloads (flagship :63-71)
    whole_word: bool = False
    language: str = "zh"
    # cosine decay to 10% of peak after warmup (long-run schedule); the
    # default constant-after-warmup schedule is kept for short runs
    lr_decay: bool = False
    # periodic orbax snapshots ("{save_path}_step{N}") for long runs
    save_every: int = 0
    save_path: str = ""
    # also save the FULL MlmModel params (encoder + head) at the end, for
    # masked-LM scoring (tools/mlm_scorer.py — the ordering_chatyuan analog)
    save_full_path: str = ""


def make_mlm_batches(
    texts: Sequence[str],
    tokenizer,
    cfg: MlmConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize the corpus once into [N, L] ids + masks."""
    enc = tokenizer.encode_batch(list(texts), cfg.seq_len)
    return enc.input_ids, enc.attention_mask


def make_word_starts(
    texts: Sequence[str],
    tokenizer,
    seq_len: int,
    language: str,
) -> np.ndarray:
    """[N, L] index of the first token of the word containing each position.

    Gathering per-position masking randomness through this map makes every
    token of a word share one mask decision — whole-word masking. Specials
    and padding point at themselves (they are never mask candidates).

    zh: words from jieba over the (space-stripped) clause; the char tokenizer
    emits exactly one token per non-space char, so word spans are char spans.
    en: WordPiece continuation pieces (``##`` prefix) extend the previous
    word, mirroring BERT-WWM's create_pretraining_data grouping.
    """
    n = len(texts)
    out = np.tile(np.arange(seq_len, dtype=np.int32), (n, 1))
    if language == "zh":
        import jieba

        for i, t in enumerate(texts):
            t = "".join(ch for ch in str(t) if not ch.isspace())
            pos = 1  # 0 is [CLS]
            for word in jieba.cut(t):
                start = pos
                for _ in word:
                    if pos < seq_len:
                        out[i, pos] = min(start, seq_len - 1)
                    pos += 1
    else:
        id_to_token = {}
        if hasattr(tokenizer, "_tok"):
            id_to_token = {v: k for k, v in tokenizer._tok.get_vocab().items()}
        for i, t in enumerate(texts):
            ids = tokenizer.tokenize_to_ids(str(t))
            pos, start = 1, 1
            for tid in ids:
                tok = id_to_token.get(tid, "")
                if not tok.startswith("##"):
                    start = pos
                if pos < seq_len:
                    out[i, pos] = min(start, seq_len - 1)
                pos += 1
    return out


def pretrain_mlm(
    encoder_cfg: EncoderConfig,
    tokenizer,
    texts: Sequence[str],
    cfg: MlmConfig = MlmConfig(),
    logger=None,
    init_params=None,
) -> dict:
    """Run MLM pretraining; returns the ENCODER param subtree."""
    # the tied head needs a mask token; char/wordpiece tokenizers reserve
    # [MASK] = id 4 (ZhCharTokenizer.SPECIALS / WordPiece special_tokens)
    mask_id = getattr(tokenizer, "token_to_id", {}).get("[MASK]", 4) \
        if hasattr(tokenizer, "token_to_id") else 4

    model = MlmModel(encoder_cfg)
    ids_all, mask_all = make_mlm_batches(texts, tokenizer, cfg)
    n = len(ids_all)
    ws_all = None
    if cfg.whole_word:
        ws_all = make_word_starts(texts, tokenizer, cfg.seq_len, cfg.language)

    rng = jax.random.key(cfg.seed)
    p_rng, rng = jax.random.split(rng)
    params = model.init(
        {"params": p_rng},
        jnp.asarray(ids_all[:2]), jnp.asarray(mask_all[:2]))["params"]
    if init_params is not None:
        params = dict(params)
        params["encoder"] = init_params

    if cfg.lr_decay:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.steps,
            end_value=cfg.learning_rate * 0.1)
    else:
        schedule = optax.linear_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps)
    tx = optax.adamw(schedule, weight_decay=0.01, eps=1e-8)
    opt_state = tx.init(params)

    # the whole tokenized corpus lives on device; minibatches are gathered
    # in-kernel so one dispatch covers scan_size optimizer steps
    ids_dev = jnp.asarray(ids_all)
    mask_dev = jnp.asarray(mask_all)
    ws_dev = jnp.asarray(ws_all) if ws_all is not None else None

    def one_step(carry, _):
        params, opt_state, rng = carry
        rng, b_rng, m_rng, r_rng, c_rng = jax.random.split(rng, 5)
        idx = jax.random.randint(b_rng, (cfg.batch_size,), 0, n)
        ids = jnp.take(ids_dev, idx, axis=0)
        attn = jnp.take(mask_dev, idx, axis=0)

        # BERT masking recipe over real non-special positions
        special = (ids <= 4)
        candidates = (attn > 0) & (~special)
        u = jax.random.uniform(m_rng, ids.shape)
        u2 = jax.random.uniform(c_rng, ids.shape)
        if ws_dev is not None:
            # whole-word: every token reads the randomness of its word's
            # first token, so the 15% mask choice and the 80/10/10 branch
            # are made once per word
            ws = jnp.take(ws_dev, idx, axis=0)
            u = jnp.take_along_axis(u, ws, axis=1)
            u2 = jnp.take_along_axis(u2, ws, axis=1)
        is_masked = (u < cfg.mask_prob) & candidates
        replace_mask = is_masked & (u2 < 0.8)
        replace_rand = is_masked & (u2 >= 0.8) & (u2 < 0.9)
        rand_ids = jax.random.randint(r_rng, ids.shape, 5,
                                      encoder_cfg.vocab_size)
        corrupted = jnp.where(replace_mask, mask_id,
                              jnp.where(replace_rand, rand_ids, ids))

        def loss_fn(p):
            logits = model.apply({"params": p}, corrupted, attn,
                                 deterministic=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]
            w = is_masked.astype(jnp.float32)
            return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, rng), loss

    scan_size = max(1, min(cfg.scan_size, cfg.steps))

    @jax.jit
    def multi_step(params, opt_state, rng):
        (params, opt_state, rng), losses = jax.lax.scan(
            one_step, (params, opt_state, rng), None, length=scan_size)
        return params, opt_state, rng, losses.mean()

    done = 0
    last_saved = 0
    while done < cfg.steps:
        params, opt_state, rng, mean_loss = multi_step(params, opt_state, rng)
        # float() is a value fetch — the only true synchronization on the
        # axon remote backend (block_until_ready returns early there)
        loss_val = float(mean_loss)
        done += scan_size
        if logger:
            logger.log({"event": "mlm_step", "step": done,
                        "loss": loss_val})
        if (cfg.save_every and cfg.save_path
                and done - last_saved >= cfg.save_every and done < cfg.steps):
            save_encoder(f"{cfg.save_path}_step{done}", params["encoder"])
            last_saved = done
    if cfg.save_full_path:
        # full MlmModel params (encoder + MLM head) for downstream scoring
        # (tools/mlm_scorer.py); the plain encoder checkpoint drops the head
        save_encoder(cfg.save_full_path, params)
    return params["encoder"]


def save_encoder(path: str, encoder_params) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, encoder_params, force=True)
    ckptr.wait_until_finished()
    return path


def load_encoder(path: str, like) -> dict:
    import orbax.checkpoint as ocp

    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), abstract)
