#!/usr/bin/env python
"""Plot loss/metric curves from train.log.json (reference tools/analyze_logs.py).

Usage: python tools/analyze_logs.py work_dirs/htd/train.log.json --keys loss s0.loss_cls
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.log) if l.strip()]
    xs = list(range(len(rows)))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for k in args.keys:
            ys = [r.get(k) for r in rows]
            plt.plot(xs, ys, label=k)
        plt.legend()
        plt.xlabel("log step")
        out = args.out or args.log + ".png"
        plt.savefig(out, dpi=120)
        print(f"saved {out}")
    except ImportError:
        # headless fallback: print a compact table
        for k in args.keys:
            ys = [r.get(k) for r in rows if k in r]
            if ys:
                print(f"{k}: first={ys[0]} min={min(ys)} last={ys[-1]}")


if __name__ == "__main__":
    main()
