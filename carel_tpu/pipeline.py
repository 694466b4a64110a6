"""End-to-end pipeline assembly: config -> datasets -> model -> train state.

Resolves corpus paths exactly like the reference entry points
(drl_classifier_ec_mmd_final_mul.py:939-948 for the old split,
newsplit :1205-1227 for the new split + predicted-emotion test files), builds
the tokenizer/BoW/arrays, and instantiates the model sized to them.
"""

from __future__ import annotations

import dataclasses
import os
import random
import uuid
from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from carel_tpu.config import CarelConfig, EncoderConfig
from carel_tpu.data.batching import PairArrays, encode_pairs
from carel_tpu.data.bow import BowVocab, build_bow_vocab_en, build_bow_vocab_zh
from carel_tpu.data.ecpe_format import parse_ecpe_file
from carel_tpu.data.pairs import PairSet, build_pairs
from carel_tpu.data.tokenizer import BaseTokenizer, build_tokenizer
from carel_tpu.models.drl import DrlModel
from carel_tpu.train.state import TrainState, create_train_state


def resolve_paths(cfg: CarelConfig) -> Tuple[str, str, str]:
    """(train_path, test_path, bow_path) per language/split flags; explicit
    data.train_file / data.test_file override the convention."""
    d = cfg.data
    root = d.data_root

    def j(*parts):
        return os.path.join(root, *parts)

    if d.train_file and d.test_file:
        default_bow = ("data/all_data_pair_zh.txt" if d.language == "zh"
                       else "data/all_data_pair_en.txt")
        return (d.train_file, d.test_file, d.bow_file or j(default_bow))

    # one-sided overrides (e.g. the in-framework stage-1 -> stage-2 chain
    # keeps the conventional train corpus but tests on self-generated
    # predicted-emotion files) fall through to the convention for the
    # unspecified side, then substitute at the end.
    if d.language == "zh":
        train_dir = "data/ECPE_new_dataset" if d.newsplit else "domains/THUCTC_multiple"
        train_path = j(train_dir, f"{d.source_domain}.txt")
        if d.self_chain:
            # self-chain trainer reads both sides from THUCTC_multiple
            # (drl_classifier_ec_mmd_self_chain.py:1028-1031)
            test_path = j("domains/THUCTC_multiple", f"{d.target_domain}.txt")
        elif d.newsplit:
            if d.predicted_emotion:
                test_path = j("pair_data/predicted_emotion",
                              f"source_{d.source_domain}",
                              f"{d.target_domain}.txt")
            else:
                test_path = j("data/ECPE_new_dataset",
                              f"{d.target_domain}_test.txt")
        else:
            test_path = j("pair_data/emotion", f"{d.target_domain}.txt")
        bow_path = d.bow_file or j("data/all_data_pair_zh.txt")
    else:
        train_path = j("domains/Englishnovel_multiple", f"{d.source_domain}.txt")
        if d.predicted_emotion:
            test_path = j("pair_data/predicted_emotion",
                          f"source_{d.source_domain}", f"{d.target_domain}.txt")
        elif d.bow_optimize:
            test_path = j("pair_data/emotion", f"{d.target_domain}_optimize.txt")
        else:
            test_path = j("pair_data/emotion", f"{d.target_domain}.txt")
        default_bow = ("data/ecpe_and_reccon_all_data_pair_en.txt"
                       if d.newsplit else "data/all_data_pair_en.txt")
        bow_path = d.bow_file or j(default_bow)
    return (d.train_file or train_path, d.test_file or test_path, bow_path)


@dataclass
class Pipeline:
    cfg: CarelConfig
    model_id: str
    tokenizer: BaseTokenizer
    bow: BowVocab
    model: DrlModel
    train_pairs: PairSet
    test_pairs: PairSet
    train_arrays: PairArrays
    test_arrays: PairArrays
    num_unpred_pairs: int

    def encode(self, pair_set: PairSet) -> PairArrays:
        return encode_pairs(pair_set, self.tokenizer, self.bow,
                            self.cfg.data.max_len)


def fit_max_len(tokenizer, texts, cap: int = 128, floor: int = 32) -> int:
    """Smallest multiple-of-16 window covering every text, in [floor, cap].

    The MXU tiles sequences in multiples of 8/16; rounding the observed max
    up to 16 keeps XLA layouts efficient while guaranteeing zero truncation
    relative to the reference's fixed 128-token window (flagship :35)."""
    probe = tokenizer.encode_batch(list(texts), cap)
    observed = int(probe.attention_mask.sum(axis=1).max())
    return min(cap, max(floor, -(-observed // 16) * 16))


def _spaced_sep(cfg: CarelConfig) -> bool:
    return cfg.data.language == "en" and cfg.data.bow_optimize


def build_pipeline(
    cfg: CarelConfig,
    cache_dir: str = ".carel_cache",
    encoder_cfg: Optional[EncoderConfig] = None,
    max_train_docs: int = 0,
    max_test_docs: int = 0,
) -> Pipeline:
    train_path, test_path, bow_path = resolve_paths(cfg)

    train_docs = parse_ecpe_file(train_path)
    test_docs = parse_ecpe_file(test_path)
    if max_train_docs:
        train_docs = train_docs[:max_train_docs]
    if max_test_docs:
        test_docs = test_docs[:max_test_docs]

    rng = random.Random(cfg.data.seed)
    spaced = _spaced_sep(cfg)
    if cfg.data.self_chain:
        from carel_tpu.data.self_chain import build_pairs_self_chain

        train_pairs = build_pairs_self_chain(train_docs, test=False,
                                             spaced_sep=spaced, rng=rng)
        test_pairs = build_pairs_self_chain(test_docs, test=True,
                                            spaced_sep=spaced, rng=rng)
    else:
        train_pairs = build_pairs(train_docs, test=False, spaced_sep=spaced,
                                  rng=rng)
        test_pairs = build_pairs(test_docs, test=True, spaced_sep=spaced,
                                 rng=rng)

    # BoW vocabulary (bow_util.py semantics)
    if cfg.data.language == "zh":
        bow = build_bow_vocab_zh(bow_path)
    else:
        bow = build_bow_vocab_en(bow_path, bow_optimize=cfg.data.bow_optimize)

    # tokenizer: corpus-built + cached (no-egress environment)
    os.makedirs(cache_dir, exist_ok=True)
    tok_cache = os.path.join(
        cache_dir, f"tokenizer_{cfg.data.language}.json")
    hf = cfg.data.tokenizer if cfg.data.tokenizer not in ("auto", "") else None
    corpus = None
    if hf is None and not os.path.exists(tok_cache):
        bow_docs = parse_ecpe_file(bow_path)
        corpus = [c.text for doc in bow_docs for c in doc.clauses]
    tokenizer = build_tokenizer(cfg.data.language, corpus, tok_cache, hf)

    # size the model to the data; a local HF checkpoint dictates the encoder
    # config (and its tokenizer should be passed via data.tokenizer). An
    # orbax directory (from carel_tpu.pretrain) keeps the configured encoder
    # shape and only supplies weights at init_state time.
    if cfg.model.pretrained_encoder and os.path.exists(
            os.path.join(cfg.model.pretrained_encoder, "config.json")):
        from carel_tpu.models.hf_port import encoder_config_from_hf

        enc = encoder_config_from_hf(cfg.model.pretrained_encoder,
                                     (encoder_cfg or cfg.model.encoder).dtype)
    else:
        enc = encoder_cfg or cfg.model.encoder
        enc = dataclasses.replace(enc, vocab_size=tokenizer.vocab_size)
    model_cfg = dataclasses.replace(cfg.model, encoder=enc, bow_dim=len(bow))
    cfg = dataclasses.replace(cfg, model=model_cfg)

    # max_len=0 -> auto-fit: the reference pads everything to 128 but zh
    # pairs measure p99<=56 tokens (max 95) — fitting the window to the data
    # cuts encoder compute proportionally with zero truncation
    if cfg.data.max_len == 0:
        auto_len = fit_max_len(tokenizer,
                               train_pairs.pairs + test_pairs.pairs)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, max_len=auto_len))

    train_arrays = encode_pairs(train_pairs, tokenizer, bow, cfg.data.max_len)
    test_arrays = encode_pairs(test_pairs, tokenizer, bow, cfg.data.max_len)

    return Pipeline(
        cfg=cfg,
        model_id=str(uuid.uuid4()),
        tokenizer=tokenizer,
        bow=bow,
        model=DrlModel(cfg.model),
        train_pairs=train_pairs,
        test_pairs=test_pairs,
        train_arrays=train_arrays,
        test_arrays=test_arrays,
        num_unpred_pairs=test_pairs.num_unpred_emotions,
    )


def init_state(pipe: Pipeline, compat_frozen_latent_heads: bool = True,
               mesh=None) -> TrainState:
    """Initialize the train state; with a mesh, params are placed BEFORE the
    optimizer states are created so the opt states inherit the same layout
    (replicated for pure DP; Megatron-split encoder weights when the mesh
    has a >1 'model' axis)."""
    cfg = pipe.cfg
    # rbg is much cheaper than threefry on TPU (measured: the per-step
    # dropout-mask RNG is 16.1 ms of a 50.5 ms flagship step at b64xs96,
    # scripts/step_breakdown.py); threefry stays the default for bitstream
    # reproducibility of published runs
    impl = getattr(cfg.train, "rng_impl", "threefry")
    rng = jax.random.key(cfg.train.seed,
                         impl="threefry2x32" if impl == "threefry" else impl)
    p_rng, s_rng, state_rng = jax.random.split(rng, 3)
    B, L = 2, cfg.data.max_len
    import jax.numpy as jnp

    dummy = (jnp.zeros((B, L), jnp.int32), jnp.ones((B, L), jnp.int32),
             jnp.zeros((B, L), jnp.int32))
    variables = pipe.model.init(
        {"params": p_rng, "sample": s_rng}, *dummy)
    params = variables["params"]
    if cfg.model.pretrained_encoder:
        params = dict(params)
        if os.path.exists(os.path.join(cfg.model.pretrained_encoder,
                                       "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            params["encoder"] = port_hf_encoder(
                cfg.model.pretrained_encoder, cfg.model.encoder)
        else:  # orbax dir from carel_tpu.pretrain
            from carel_tpu.pretrain import load_encoder

            params["encoder"] = load_encoder(
                cfg.model.pretrained_encoder, params["encoder"])
    if mesh is not None:
        if "model" in mesh.axis_names and mesh.shape["model"] > 1:
            from carel_tpu.parallel.tp import shard_params_tp

            params = shard_params_tp(mesh, params)
        else:
            from carel_tpu.parallel.sharding import shard_params

            params = shard_params(mesh, params)
    return create_train_state(cfg, params, state_rng,
                              compat_frozen_latent_heads)
