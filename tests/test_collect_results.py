"""Unit tests for scripts/collect_results.py — the queue-log joiner that
publishes the multi-seed quality matrix (SURVEY hard-part #2)."""

import importlib.util
import json
import os
import sys


def _load(qdir):
    os.environ["CAREL_QDIR"] = str(qdir)
    spec = importlib.util.spec_from_file_location(
        "collect_results",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "collect_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_fixture(qdir):
    qdir.mkdir(parents=True)
    log = [
        # pre-r5 runner format
        "=== 20260817-100000 RUN: bash scripts/zh_run.sh education 42 150 "
        "--self_epochs 5 --self_max_dist 2",
        "=== 20260817-110000 EXIT 0: ...",
        # r5 outage-proof runner format (timeout annotation + requeue prefix)
        "=== 20260817-120000 RUN (timeout 9000s): TIMEOUT=9000 bash "
        "scripts/zh_run.sh education 7 150 --self_epochs 5 --self_max_dist 2",
        # same domain/seed but a DIFFERENT recipe: must NOT pool (ADVICE r4)
        "=== 20260817-130000 RUN: bash scripts/zh_run.sh education 1234 150 "
        "--self_epochs 5",
    ]
    (qdir / "queue.log").write_text("\n".join(log) + "\n")
    for ts, f1 in [("20260817-100000", 0.70), ("20260817-120000", 0.72),
                   ("20260817-130000", 0.60)]:
        (qdir / f"{ts}.log").write_text(
            json.dumps({"best_f1": f1, "base_f1": 0.2, "model_id": ts}) + "\n")


def test_load_jobs_both_runner_formats(tmp_path):
    _write_fixture(tmp_path / "q")
    mod = _load(tmp_path / "q")
    jobs = mod._load_jobs("")
    assert len(jobs) == 3
    # the TIMEOUT= requeue prefix is stripped so grouping keys match
    assert jobs[1]["cmd"].startswith("bash scripts/zh_run.sh education 7")
    assert jobs[0]["result"]["best_f1"] == 0.70


def test_matrix_groups_by_recipe(tmp_path, capsys):
    _write_fixture(tmp_path / "q")
    mod = _load(tmp_path / "q")
    mod._matrix(mod._load_jobs(""))
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l.startswith("| education")]
    # two distinct recipes -> two rows; the max_dist-2 recipe pools 2 seeds
    assert len(rows) == 2
    pooled = [r for r in rows if "--self_max_dist 2" in r][0]
    assert "s42=0.7000" in pooled and "s7=0.7200" in pooled
    assert "0.7100" in pooled  # mean of the pooled cell
    lone = [r for r in rows if "--self_max_dist 2" not in r][0]
    assert "s1234=0.6000" in lone
