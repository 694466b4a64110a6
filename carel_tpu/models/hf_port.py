"""Port HuggingFace BERT/RoBERTa checkpoints into TransformerEncoder params.

The reference downloads `hfl/chinese-roberta-wwm-ext` / `roberta-base` from
the hub (flagship :63-71, :186-192). The TPU environment has no egress, so
this module loads a LOCAL checkpoint directory (pytorch_model.bin /
model.safetensors + config.json) and maps it onto our Flax layout; combined
with HFTokenizerAdapter it gives full pretrained parity when the user
provides the files.

Weight layout notes:
- HF Linear weights are [out, in]; Flax Dense kernels are [in, out];
- our fused qkv is a DenseGeneral with kernel [hidden, 3, heads, head_dim];
- our attention out-projection is a DenseGeneral with kernel
  [heads, head_dim, hidden].
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from carel_tpu.config import EncoderConfig


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {path}")


def encoder_config_from_hf(path: str, dtype: str = "bfloat16") -> EncoderConfig:
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    arch = "roberta" if "roberta" in cfg.get("model_type", "bert") else "bert"
    return EncoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_dim=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        mlp_dim=cfg["intermediate_size"],
        max_position=cfg["max_position_embeddings"],
        # RoBERTa keeps a size-1 token-type table added to every position
        type_vocab_size=cfg.get("type_vocab_size", 0),
        dropout=cfg.get("hidden_dropout_prob", 0.1),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        arch=arch,
        pad_token_id=cfg.get("pad_token_id", 0 if arch == "bert" else 1),
        dtype=dtype,
    )


def port_hf_encoder(path: str, cfg: EncoderConfig) -> Dict[str, Any]:
    """Build our TransformerEncoder param dict from an HF checkpoint dir."""
    sd = _load_state_dict(path)
    # strip the model prefix ("bert." / "roberta.")
    prefixes = ("bert.", "roberta.", "")
    pref = next(p for p in prefixes
                if any(k.startswith(p + "embeddings") for k in sd))

    def g(name: str) -> np.ndarray:
        return np.asarray(sd[pref + name], np.float32)

    h = cfg.hidden_dim
    nh = cfg.num_heads
    hd = h // nh

    params: Dict[str, Any] = {
        "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")},
        "embeddings_ln": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
        "pooler": {
            "kernel": g("pooler.dense.weight").T,
            "bias": g("pooler.dense.bias"),
        },
    }
    if cfg.type_vocab_size > 0:
        params["token_type_embeddings"] = {
            "embedding": g("embeddings.token_type_embeddings.weight")}

    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        qkv_w = np.stack(
            [g(p + f"attention.self.{n}.weight").T.reshape(h, nh, hd)
             for n in ("query", "key", "value")], axis=1)  # [h, 3, nh, hd]
        qkv_b = np.stack(
            [g(p + f"attention.self.{n}.bias").reshape(nh, hd)
             for n in ("query", "key", "value")], axis=0)  # [3, nh, hd]
        params[f"layer_{i}"] = {
            "attention": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "out": {
                    "kernel": g(p + "attention.output.dense.weight")
                    .T.reshape(nh, hd, h),
                    "bias": g(p + "attention.output.dense.bias"),
                },
            },
            "attention_ln": {
                "scale": g(p + "attention.output.LayerNorm.weight"),
                "bias": g(p + "attention.output.LayerNorm.bias"),
            },
            "mlp_in": {
                "kernel": g(p + "intermediate.dense.weight").T,
                "bias": g(p + "intermediate.dense.bias"),
            },
            "mlp_out": {
                "kernel": g(p + "output.dense.weight").T,
                "bias": g(p + "output.dense.bias"),
            },
            "mlp_ln": {
                "scale": g(p + "output.LayerNorm.weight"),
                "bias": g(p + "output.LayerNorm.bias"),
            },
        }
    return params


def load_pretrained_encoder(path: str, dtype: str = "bfloat16"):
    """(EncoderConfig, params) from a local HF checkpoint directory."""
    cfg = encoder_config_from_hf(path, dtype)
    return cfg, port_hf_encoder(path, cfg)
