"""Cross-validate the from-scratch COCO evaluator against a transcription
of pycocotools' COCOeval on randomized adversarial fixtures (VERDICT round-1
missing #5): crowds, area-boundary boxes, score ties, >100 dets per
image/class, empty images, det-only images.
"""

import numpy as np
import pytest


from tests import cocoeval_oracle as oracle
from htd_tpu.data.coco_eval import evaluate_coco_map

pytestmark = pytest.mark.fast

NUM_CLASSES = 10


def _fixture(seed, num_imgs=50):
    rng = np.random.RandomState(seed)
    gts, dets = {}, {}
    for img in range(num_imgs):
        g = rng.randint(0, 9)
        boxes, labels, crowd = [], [], []
        for _ in range(g):
            # areas spanning all ranges, some EXACTLY at the 32^2 / 96^2
            # boundaries (inclusive/exclusive semantics must agree)
            kind = rng.randint(0, 5)
            if kind == 0:
                w = h = 32.0  # area == 1024 exactly
            elif kind == 1:
                w = h = 96.0  # area == 9216 exactly
            else:
                w = rng.uniform(4, 300)
                h = rng.uniform(4, 300)
            x1 = rng.uniform(0, 600)
            y1 = rng.uniform(0, 600)
            boxes.append([x1, y1, x1 + w, y1 + h])
            labels.append(rng.randint(0, NUM_CLASSES))
            crowd.append(rng.rand() < 0.2)
        gts[img] = (
            np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(labels, np.int64),
            np.asarray(crowd, bool),
        )

        d = rng.randint(0, 25)
        if img == 0:
            d = 140  # exceed maxDets=100 for one (img, class)
        dboxes, dscores, dlabels = [], [], []
        gb, gl, _ = gts[img]
        for _ in range(d):
            if len(gb) and rng.rand() < 0.6:
                # jittered copy of a gt (mix of above/below IoU thresholds)
                j = rng.randint(len(gb))
                base = gb[j]
                jit = rng.uniform(-0.25, 0.25, 4) * (
                    base[2] - base[0] + base[3] - base[1]
                ) / 2.0
                box = base + jit
                lab = gl[j] if rng.rand() < 0.8 else rng.randint(0, NUM_CLASSES)
            else:
                w = rng.uniform(4, 300)
                h = rng.uniform(4, 300)
                x1 = rng.uniform(0, 600)
                y1 = rng.uniform(0, 600)
                box = np.asarray([x1, y1, x1 + w, y1 + h])
                lab = rng.randint(0, NUM_CLASSES)
            if img == 0:
                lab = 3  # concentrate on one class to break maxDets
            dboxes.append(box)
            # quantized scores -> plenty of exact ties
            dscores.append(round(rng.rand(), 2))
            dlabels.append(lab)
        dets[img] = (
            np.asarray(dboxes, np.float64).reshape(-1, 4),
            np.asarray(dscores, np.float64),
            np.asarray(dlabels, np.int64),
        )
    # one image with gts but no dets at all
    dets[0 if num_imgs == 0 else num_imgs - 1] = (
        np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64))
    return dets, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_matches_pycocotools_logic(seed):
    dets, gts = _fixture(seed)
    ours = evaluate_coco_map(dets, gts, num_classes=NUM_CLASSES)
    ref = oracle.evaluate(dets, gts, num_classes=NUM_CLASSES)
    for k in ("mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l", "AR@100"):
        o, r = ours[k], ref[k]
        if np.isnan(r):
            assert np.isnan(o), k
        else:
            assert abs(o - r) <= 1e-6, f"{k}: ours {o} vs pycocotools-logic {r}"
