"""CIT classifier end-to-end chain (VERDICT r1 item 4).

Reproduces the reference pipeline mc_classifier.py:442-547: pair-inference
prediction pickles -> triple building with KNN negatives -> CIT training ->
prediction-filtering metrics, all through the public CLI.
"""

import json

import numpy as np

from carel_tpu.cli.main import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_infer_to_cit_chain(tmp_path, capsys):
    common = [
        "--cpu", "--preset", "ec_mmd_final_mul_newsplit_emnlp",
        "--data_root", "/root/reference", "--encoder", "tiny",
        "--max_train_docs", "6", "--max_test_docs", "8",
        "--cache_dir", str(tmp_path / "cache"),
        "--log_dir", str(tmp_path / "logs"),
    ]
    rc, res = _run(capsys, [
        "infer", *common, "--output_dir", str(tmp_path / "ec_pair"),
    ])
    assert rc == 0
    preds = list((tmp_path / "ec_pair").glob("*_pred.pkl"))
    trues = list((tmp_path / "ec_pair").glob("*_true.pkl"))
    assert len(preds) == 1 and len(trues) == 1
    pred, true = preds[0], trues[0]

    rc, res = _run(capsys, [
        "cit", *common, "--pred_pkl", str(pred), "--true_pkl", str(true),
        "--epochs", "1", "--self_iteration", "1", "--self_epochs", "1",
        "--batch_size", "8", "--max_len", "48",
    ])
    assert rc == 0
    assert 0.0 <= res["best"]["f1"] <= 1.0
    assert res["best"]["f1"] >= res["base"]["f1"] - 1e-9


def test_selftrain_triples_reference_semantics():
    """Per-doc KNN-negative construction mirrors generate_self_train_data
    (mc_classifier.py:167-238) including the first-occurrence text lookup and
    the self-chain branch."""
    from carel_tpu.data.ecpe_format import Clause, Document
    from carel_tpu.train.cit_trainer import selftrain_triples

    def doc(texts, doc_id="1"):
        return Document(
            doc_id=doc_id, pairs=[],
            clauses=[Clause(sen_id=i + 1, emotion=6, cause=-1, text=t,
                            text_field3=t) for i, t in enumerate(texts)])

    docs = [doc(["aa", "bb", "cc", "dd"])]
    # candidate pairs for the doc: 4 candidates; predictions mark #0 (aa,bb)
    # and #3 (cc,cc self-chain) positive
    pair_texts = ["aa[SEP]bb", "aa[SEP]cc", "aa[SEP]dd", "cc[SEP]cc"]
    preds = np.asarray([1, 0, 0, 1], np.float32)

    # embedder: 1-d embeddings = clause index -> 3rd-NN of i is sorted by
    # |j - i| with stable ties
    embedder = lambda texts: np.arange(len(texts), dtype=np.float32)[:, None]

    ps = selftrain_triples(docs, [4], pair_texts, preds, embedder,
                           neighbor_rank=2)
    assert len(ps) == 4  # 2 positives x (pos + neg)
    labels = [e.label for e in ps.examples]
    assert labels == [1, 0, 1, 0]
    # pair (aa, bb): cause idx 1, NNs of 1 by |d|: 1, 0, 2 -> neg middle "cc"
    assert ps.examples[0].pair == "aa[SEP]bb[SEP]bb"
    assert ps.examples[1].pair == "aa[SEP]cc[SEP]bb"
    # self-chain (cc, cc): emo idx 2, NNs: 2, 1, 3 -> neg middle "dd"
    assert ps.examples[2].pair == "cc[SEP]cc[SEP]cc"
    assert ps.examples[3].pair == "cc[SEP]dd[SEP]cc"
