"""Summarize a carel_tpu train jsonl log: base epochs + self-train trajectory.

Usage: python scripts/traj.py runs/logs/train_*.jsonl
"""
import json
import sys


def main(paths):
    for path in paths:
        base_best, traj, final = -1.0, [], None
        with open(path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("event")
                if ev == "eval":
                    base_best = max(base_best, e.get("f1", -1.0))
                elif ev == "selftrain_best":
                    traj.append((e.get("iteration"), round(e["f1"], 4)))
                elif ev == "self_done":
                    final = e
        print(f"== {path}")
        print(f"   base best F1: {base_best:.4f}")
        if traj:
            print(f"   self-train improvements: {traj}")
        if final:
            print(f"   final: p={final['p']:.4f} r={final['r']:.4f} "
                  f"f1={final['f1']:.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
