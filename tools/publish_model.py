#!/usr/bin/env python
"""Strip a training checkpoint to publishable weights (+content hash).

Reference analog: tools/publish_model.py — removes the optimizer state,
keeps model params + meta, and renames the file with the first 8 hex chars
of its sha256 (`htd_r50-<hash>` convention).

Usage: python tools/publish_model.py <in_ckpt_dir> <out_ckpt_dir>
"""

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="orbax checkpoint directory (a train step)")
    p.add_argument("out_ckpt", help="output directory; '-<hash8>' appended")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from htd_tpu.train.checkpoint import save_checkpoint

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(args.in_ckpt))
    params = raw.get("params", raw) if isinstance(raw, dict) else raw.params
    out = args.out_ckpt.rstrip("/")
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    save_checkpoint(tmp, {"params": params})

    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(tmp)):
        for f in sorted(files):
            with open(os.path.join(root, f), "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
    final = f"{out}-{h.hexdigest()[:8]}"
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    print(final)


if __name__ == "__main__":
    main()
