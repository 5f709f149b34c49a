#!/usr/bin/env python
"""Print a resolved config (reference tools/print_config.py equivalent)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="htd_r50_1x")
    args = p.parse_args()

    from htd_tpu import config as C

    cfg = getattr(C, args.config)()
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
