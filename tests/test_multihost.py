"""2-process jax.distributed CPU test (VERDICT round-1 missing #4).

Spawns two REAL processes forming a 4-device global mesh (2 local CPU
devices each, gloo collectives) and runs 3 full HTD train steps through
the same host-sliced data path tools/train.py uses
(host_slice + make_global_batch). The loss trajectory must match a
single-process 4-device run on the same global batch.

The reference has no distributed tests at all (SURVEY.md §4); DDP
correctness there is delegated to torch. Here the data path is ours, so
it is tested.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _run(args, timeout):
    return subprocess.Popen(
        [sys.executable, WORKER] + [str(a) for a in args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
@pytest.mark.multichip
def test_two_process_matches_single_process(tmp_path):
    out2 = tmp_path / "mh2.json"
    out1 = tmp_path / "mh1.json"

    p0 = _run([0, 2, 29541, out2], 1200)
    p1 = _run([1, 2, 29541, tmp_path / "unused.json"], 1200)
    o0, _ = p0.communicate(timeout=1800)
    o1, _ = p1.communicate(timeout=1800)
    assert p0.returncode == 0, f"proc0 failed:\n{o0[-2000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{o1[-2000:]}"

    p = _run([0, 1, 0, out1], 1200)
    o, _ = p.communicate(timeout=1800)
    assert p.returncode == 0, f"single-proc failed:\n{o[-2000:]}"

    losses2 = json.load(open(out2))
    losses1 = json.load(open(out1))
    assert len(losses2) == len(losses1) == 3
    for a, b in zip(losses2, losses1):
        # identical global batch + replicated params; only the collective
        # reduction order differs between 2x2 and 1x4 device layouts
        assert abs(a - b) / max(abs(b), 1e-9) < 1e-4, (losses2, losses1)
