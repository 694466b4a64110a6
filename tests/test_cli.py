"""In-process CLI tests for the fast (CPU, host-only) subcommands."""

import json
import os

import pytest

from carel_tpu.cli.main import main
from tests.conftest import REFERENCE_ROOT, requires_reference_data


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_presets_lists_all(capsys):
    rc, out = run_cli(capsys, ["presets"])
    assert rc == 0
    for name in ["ec_mmd_final_mul_newsplit_emnlp", "ec_gan", "ec_vi_final",
                 "ec_hsic", "ec_none", "drl_en", "en_newsplit"]:
        assert name in out


@requires_reference_data
def test_ordering_cli(capsys):
    rc, out = run_cli(capsys, [
        "ordering", "--file",
        os.path.join(REFERENCE_ROOT, "data/ECPE_new_dataset/lottery.txt")])
    assert rc == 0
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["total_pairs"] > 0
    assert 0 <= stats["temporal_order_rate"] <= 1


@requires_reference_data
def test_convert_cli(capsys, tmp_path):
    out_path = str(tmp_path / "t.txt")
    rc, out = run_cli(capsys, [
        "convert", "train_to_test",
        "--source", os.path.join(REFERENCE_ROOT,
                                 "data/ECPE_new_dataset/lottery.txt"),
        "--target", out_path])
    assert rc == 0
    from carel_tpu.data.ecpe_format import parse_ecpe_file

    docs = parse_ecpe_file(out_path)
    assert all(c.cause == -1 for c in docs[0].clauses)


def test_embeddings_npz_roundtrip(tmp_path):
    import numpy as np

    from carel_tpu.embeddings import load_embeddings, save_embeddings

    emb = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    labels = np.arange(5)
    path = str(tmp_path / "cache")
    save_embeddings(path, emb, labels)
    e2, l2 = load_embeddings(path)
    np.testing.assert_array_equal(e2, emb)
    np.testing.assert_array_equal(l2, labels)


@requires_reference_data
def test_embed_cli(capsys, tmp_path):
    """Domain-embedder fine-tune + embedding dump (sentence-transformer
    scripts equivalent)."""
    import numpy as np

    rc, out = run_cli(capsys, [
        "embed", "--cpu",
        "--files",
        os.path.join(REFERENCE_ROOT, "data/ECPE_new_dataset/home.txt"),
        os.path.join(REFERENCE_ROOT, "data/ECPE_new_dataset/lottery.txt"),
        "--level", "doc", "--encoder", "tiny", "--epochs", "1",
        "--batch_size", "8", "--max_len", "48", "--max_texts", "24",
        "--out", str(tmp_path / "enc"),
        "--dump_embeddings", str(tmp_path / "embs.npz"),
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs")])
    assert rc == 0
    res = json.loads(out.strip().splitlines()[-1])
    assert res["texts"] == 24
    d = np.load(tmp_path / "embs.npz")
    assert d["embeddings"].shape[0] == 24


@requires_reference_data
def test_pretrain_then_train_chain(capsys, tmp_path):
    """CLI contract of the no-egress bootstrap: pretrain writes an orbax
    encoder dir that train consumes via --hf_encoder (the recipe behind every
    quality number in RESULTS.md)."""
    enc_dir = str(tmp_path / "enc")
    rc, out = run_cli(capsys, [
        "pretrain", "--cpu", "--preset", "ec_mmd_final_mul_newsplit_emnlp",
        "--data_root", REFERENCE_ROOT,
        "--corpus", os.path.join(REFERENCE_ROOT,
                                 "data/ECPE_new_dataset/lottery.txt"),
        "--encoder", "tiny", "--steps", "4", "--scan_size", "2",
        "--mlm_batch", "8", "--seq_len", "32", "--whole_word",
        "--save_mlm", str(tmp_path / "mlm_full"),
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"), "--out", enc_dir])
    assert rc == 0
    assert json.loads(out.strip().splitlines()[-1])["encoder_ckpt"] == enc_dir
    # --save_mlm pins the exact tokenizer as a SIBLING file (inside the dir
    # orbax would wipe it on save); ordering --mlm_model resolves it first
    assert os.path.exists(str(tmp_path / "mlm_full") + ".tokenizer.json")
    assert os.path.isdir(tmp_path / "mlm_full")

    rc, out = run_cli(capsys, [
        "train", "--cpu", "--preset", "ec_mmd_final_mul_newsplit_emnlp",
        "--data_root", REFERENCE_ROOT, "--encoder", "tiny",
        "--hf_encoder", enc_dir, "--epochs", "1",
        "--self_iteration", "0", "--max_train_docs", "12",
        "--max_test_docs", "12",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
        "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 0
    res = json.loads(out.strip().splitlines()[-1])
    assert "best_f1" in res and res["best_f1"] >= 0


@requires_reference_data
def test_original_drl_chain(capsys, tmp_path):
    """End-to-end original 3-latent DRL (drl_classifier.py:802-1041): real
    old-split corpora, six-optimizer step, self-training, best-F1 ckpt."""
    rc, out = run_cli(capsys, [
        "original", "--cpu", "--encoder", "tiny",
        "--data_root", REFERENCE_ROOT,
        "--epochs", "1", "--self_iteration", "1", "--self_epochs", "1",
        "--max_train_docs", "8", "--max_test_docs", "8",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
        "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 0
    res = json.loads(out.strip().splitlines()[-1])
    assert "best_f1" in res and res["best_f1"] >= 0
    # the bow_loss variant (learned BoW re-weighting) through the same verb
    rc, out = run_cli(capsys, [
        "original", "--cpu", "--encoder", "tiny", "--bow_loss",
        "--con_mul_loss_weight", "5", "--data_root", REFERENCE_ROOT,
        "--epochs", "1", "--self_iteration", "0",
        "--max_train_docs", "6", "--max_test_docs", "6",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
        "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 0
    assert json.loads(out.strip().splitlines()[-1])["best_f1"] >= 0


@requires_reference_data
def test_self_chain_train_chain(capsys, tmp_path):
    """ec_mmd_self_chain preset: self-chain reader through the full VAE
    trainer (drl_classifier_ec_mmd_self_chain.py:1028-1072)."""
    rc, out = run_cli(capsys, [
        "train", "--preset", "ec_mmd_self_chain", "--cpu",
        "--encoder", "tiny", "--data_root", REFERENCE_ROOT,
        "--epochs", "1", "--self_iteration", "1", "--self_epochs", "1",
        "--max_train_docs", "10", "--max_test_docs", "30",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
        "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert rc == 0
    res = json.loads(out.strip().splitlines()[-1])
    assert "best_f1" in res and res["best_f1"] >= 0


@requires_reference_data
def test_ordering_mlm_requires_pinned_tokenizer(capsys, tmp_path):
    """ordering --mlm_model must REFUSE to rebuild a tokenizer from the probe
    file: a rebuilt zh vocab can share vocab_size (padded to 128) yet permute
    ids, loading cleanly and scoring garbage (ADVICE r4). Resolution order is
    <mlm_model>.tokenizer.json (pinned by pretrain --save_mlm) then the
    --cache_dir training cache; neither present -> hard error."""
    with pytest.raises(SystemExit, match="no tokenizer found"):
        main(["ordering", "--cpu", "--file",
              os.path.join(REFERENCE_ROOT,
                           "data/ECPE_new_dataset/lottery.txt"),
              "--mlm_model", str(tmp_path / "no_such_mlm"),
              "--language", "zh",
              "--cache_dir", str(tmp_path / "empty_cache")])
