"""Detection visualization (reference BaseDetector.show_result equivalent)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def draw_detections(
    img_bgr: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    labels: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    score_thr: float = 0.3,
    out_file: Optional[str] = None,
) -> np.ndarray:
    import cv2

    img = img_bgr.copy()
    keep = scores >= score_thr
    for box, score, label in zip(boxes[keep], scores[keep], labels[keep]):
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        color = tuple(int(c) for c in np.random.RandomState(int(label)).randint(60, 255, 3))
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        name = class_names[int(label)] if class_names else str(int(label))
        cv2.putText(
            img, f"{name} {score:.2f}", (x1, max(y1 - 4, 10)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA,
        )
    if out_file:
        cv2.imwrite(out_file, img)
    return img
