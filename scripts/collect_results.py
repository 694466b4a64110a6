"""Collect round TPU-queue results into a markdown table.

Joins runs/q/queue.log (timestamp -> command) with each job's stdout log
(runs/q/<ts>.log, whose last JSON line carries model_id/best_f1/base_f1).

Usage: python scripts/collect_results.py [--since YYYYmmdd-HHMMSS]
"""

import json
import os
import re
import sys

QDIR = "runs/q"


def main():
    since = ""
    if "--since" in sys.argv:
        since = sys.argv[sys.argv.index("--since") + 1]
    jobs = []
    with open(os.path.join(QDIR, "queue.log")) as f:
        for line in f:
            m = re.match(r"=== (\S+) RUN: (.*)", line.strip())
            if m and m.group(1) >= since:
                jobs.append({"ts": m.group(1), "cmd": m.group(2)})
    print("| job | result |")
    print("|---|---|")
    for j in jobs:
        path = os.path.join(QDIR, f"{j['ts']}.log")
        result = "(running/missing)"
        if os.path.exists(path):
            for line in reversed(open(path, errors="ignore").readlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    keys = [k for k in ("best_f1", "base_f1", "pair_file",
                                        "model_id", "value", "vs_baseline")
                            if k in d]
                    if keys:
                        result = ", ".join(f"{k}={d[k]}" for k in keys)
                    break
        cmd = j["cmd"].replace("bash scripts/", "").replace(
            "python -m carel_tpu.cli ", "cli ").replace(
            "--data_root /root/reference ", "")
        print(f"| `{cmd[:110]}` | {result} |")


if __name__ == "__main__":
    main()
