"""Collect round TPU-queue results into a markdown table.

Joins runs/q/queue.log (timestamp -> command) with each job's stdout log
(runs/q/<ts>.log, whose last JSON line carries model_id/best_f1/base_f1).

Usage: python scripts/collect_results.py [--since YYYYmmdd-HHMMSS] [--matrix]

--matrix groups zh_run.sh jobs by (target_domain, regularizer arm) and
prints per-domain mean +/- std over seeds — the distribution-level quality
table the reference's stochastic eval protocol calls for (SURVEY hard-part
#2: its eval resamples until bars clear, mmd_wommd_case_analysis.py:660-694,
so single-seed points are not comparable evidence).
"""

import json
import math
import os
import re
import sys

QDIR = os.environ.get("CAREL_QDIR", "runs/q")


def _load_jobs(since: str):
    jobs = []
    with open(os.path.join(QDIR, "queue.log")) as f:
        for line in f:
            # both runner formats: "RUN: cmd" (pre-r5) and
            # "RUN (timeout 6000s): cmd" (outage-proof runner, r5)
            m = re.match(r"=== (\S+) RUN(?: \(timeout \d+s\))?: (.*)",
                         line.strip())
            if m and m.group(1) >= since:
                cmd = m.group(2)
                # strip the per-job timeout prefix a requeue prepends
                cmd = re.sub(r"^TIMEOUT=\d+ ", "", cmd)
                jobs.append({"ts": m.group(1), "cmd": cmd})
    for j in jobs:
        path = os.path.join(QDIR, f"{j['ts']}.log")
        j["result"] = {}
        if os.path.exists(path):
            for line in reversed(open(path, errors="ignore").readlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if any(k in d for k in ("best_f1", "base_f1", "pair_file",
                                            "model_id", "value",
                                            "vs_baseline")):
                        j["result"] = d
                        break
    return jobs


def _matrix(jobs) -> None:
    # group key includes the FULL recipe flag-set (everything after
    # "zh_run.sh <domain> <seed>"), not just the regularizer arm — without
    # it, runs from different rounds with different --self_max_dist/--epochs
    # recipes silently pool into one misleading mean +/- std cell (ADVICE r4)
    groups = {}  # (domain, arm, recipe) -> list of (seed, best_f1)
    for j in jobs:
        m = re.match(r"bash scripts/zh_run\.sh (\S+) (\d+) (.*)", j["cmd"])
        if not m or "best_f1" not in j["result"]:
            continue
        arm = "none" if "--regularizer none" in j["cmd"] else "mmd"
        recipe = m.group(3).strip()
        groups.setdefault((m.group(1), arm, recipe), []).append(
            (int(m.group(2)), float(j["result"]["best_f1"])))
    print("| domain | arm | recipe | seeds | best pair-F1 per seed "
          "| mean +/- std |")
    print("|---|---|---|---|---|---|")
    for (dom, arm, recipe), vals in sorted(groups.items()):
        vals.sort()
        f1s = [v for _, v in vals]
        mean = sum(f1s) / len(f1s)
        std = (math.sqrt(sum((x - mean) ** 2 for x in f1s) / (len(f1s) - 1))
               if len(f1s) > 1 else 0.0)
        per_seed = ", ".join(f"s{s}={v:.4f}" for s, v in vals)
        print(f"| {dom} | {arm} | `{recipe}` | {len(f1s)} | {per_seed} "
              f"| {mean:.4f} +/- {std:.4f} |")


def main():
    since = ""
    if "--since" in sys.argv:
        since = sys.argv[sys.argv.index("--since") + 1]
    jobs = _load_jobs(since)
    if "--matrix" in sys.argv:
        _matrix(jobs)
        return
    print("| job | result |")
    print("|---|---|")
    for j in jobs:
        d = j["result"]
        keys = [k for k in ("best_f1", "base_f1", "pair_file", "model_id",
                            "value", "vs_baseline") if k in d]
        result = (", ".join(f"{k}={d[k]}" for k in keys)
                  if keys else "(running/missing)")
        cmd = j["cmd"].replace("bash scripts/", "").replace(
            "python -m carel_tpu.cli ", "cli ").replace(
            "--data_root /root/reference ", "")
        print(f"| `{cmd[:110]}` | {result} |")


if __name__ == "__main__":
    main()
