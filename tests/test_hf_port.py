"""HF checkpoint porting round-trip: a randomly-initialized tiny HF
BertModel/RobertaModel saved locally must produce (near-)identical outputs
through our TransformerEncoder after porting — verifying both the weight
mapping and our architecture against the reference's encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from carel_tpu.models.encoder import TransformerEncoder
from carel_tpu.models.hf_port import load_pretrained_encoder


def _tiny_hf(arch: str, tmp_path):
    if arch == "bert":
        cfg = transformers.BertConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, type_vocab_size=2)
        model = transformers.BertModel(cfg)
    else:
        cfg = transformers.RobertaConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40, pad_token_id=1)
        model = transformers.RobertaModel(cfg)
    model.eval()
    path = str(tmp_path / arch)
    model.save_pretrained(path)
    return model, path


@pytest.mark.parametrize("arch", ["bert", "roberta"])
def test_hf_port_output_parity(arch, tmp_path):
    hf_model, path = _tiny_hf(arch, tmp_path)
    enc_cfg, params = load_pretrained_encoder(path, dtype="float32")
    assert enc_cfg.arch == arch
    assert enc_cfg.num_layers == 2

    rng = np.random.default_rng(0)
    B, L = 3, 12
    ids = rng.integers(5, 100, (B, L)).astype(np.int64)
    mask = np.ones((B, L), np.int64)
    mask[:, 9:] = 0
    ids[:, 9:] = enc_cfg.pad_token_id
    types = np.zeros((B, L), np.int64)

    with torch.no_grad():
        kwargs = dict(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        )
        if arch == "bert":
            kwargs["token_type_ids"] = torch.tensor(types)
        out = hf_model(**kwargs)
        hf_hidden = out.last_hidden_state.numpy()
        hf_pooled = out.pooler_output.numpy()

    enc = TransformerEncoder(enc_cfg)
    ours_hidden, ours_pooled = enc.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(types, jnp.int32) if arch == "bert" else None,
    )
    # only compare non-padded positions (HF computes garbage under the mask,
    # we also don't care there)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours_hidden)[m], hf_hidden[m], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours_pooled), hf_pooled, rtol=2e-4, atol=2e-5)
