"""Slow end-to-end reference-user drill (VERDICT r04 item 3) at reduced
scale: real-format .pth -> convert -> tools/test.py --coco-dump ->
coco_error_analysis -> torch-mirror mAP parity on a pseudo-GT built from
the mirror's own confident detections.

The production-scale invocation (full (1333, 800), 100 images) is
`python tools/drill_production.py` — run on the TPU; this test keeps the
same composition at a CPU-affordable size.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_drill_small(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "drill_production.py"),
         "--images", "4", "--mirror-images", "2", "--scale", "256x160",
         "--out", str(tmp_path), "--platform", "cpu",
         "--expect-set-parity"],
        capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(r.stderr[-1500:])
    assert r.returncode == 0, r.stdout[-1000:]
    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["match_frac"] >= 0.9
    assert summary["box_mad_px"] <= 2.0
