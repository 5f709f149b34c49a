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
         # cls-std 0.3 reproduces the recorded 2026-08-21 small-scale run
         # (mirror mAP@50 0.6771 vs htd 0.6796). The always-on assertions
         # are the PAIR-level parity metrics; --expect-set-parity is the
         # trained-checkpoint mode (see the tool's help for the rank-chaos
         # analysis of untrained score ties).
         "--cls-std", "0.3"],
        capture_output=True, text=True, timeout=3600,
    )
    sys.stderr.write(r.stderr[-1500:])
    assert r.returncode == 0, r.stdout[-1000:]
    summary = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["matched"] >= 10
    assert summary["box_mad_px"] <= 2.0
    assert summary["score_mad"] <= 0.02
