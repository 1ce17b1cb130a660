"""Compare two training runs' metrics.jsonl over an overlapping step range.

The on-chip kill+resume certification (PROFILE.md, reference resume semantics:
/root/reference/train_emage_audio.py:281-294,313-317) asserts that a run resumed
from ckpt/last.bin reproduces the killed run's logged loss rows exactly over the
replayed window. This formalizes the r4c/r5 eyeball diff:

    python scripts/compare_resume_logs.py ORIG_metrics.jsonl RESUMED_metrics.jsonl \
        [--from 45050] [--to 46650] [--decimals 4]

Exit 0 when every overlapping row matches to --decimals; prints the first
mismatch otherwise.
"""
from __future__ import annotations

import argparse
import json
import sys


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if "all_loss" in r:
                rows[int(r["step"])] = r
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("orig")
    ap.add_argument("resumed")
    ap.add_argument("--from", dest="lo", type=int, default=None)
    ap.add_argument("--to", dest="hi", type=int, default=None)
    ap.add_argument("--decimals", type=int, default=4)
    args = ap.parse_args()

    a, b = load(args.orig), load(args.resumed)
    steps = sorted(set(a) & set(b))
    if args.lo is not None:
        steps = [s for s in steps if s >= args.lo]
    if args.hi is not None:
        steps = [s for s in steps if s <= args.hi]
    if not steps:
        print("no overlapping steps"); sys.exit(2)
    bad = 0
    for s in steps:
        keys = (set(a[s]) | set(b[s])) - {"step"}
        for k in sorted(keys):
            va, vb = a[s].get(k), b[s].get(k)
            if va is None or vb is None or round(va, args.decimals) != round(vb, args.decimals):
                print(f"MISMATCH step {s} {k}: {va} vs {vb}")
                bad += 1
                if bad > 10:
                    sys.exit(1)
    if bad:
        sys.exit(1)
    print(f"OK: {len(steps)} overlapping rows ({steps[0]}..{steps[-1]}) match "
          f"to {args.decimals} decimals on every key")


if __name__ == "__main__":
    main()
