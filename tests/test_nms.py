import numpy as np
import pytest

import jax
import jax.numpy as jnp

from htd_tpu.ops import nms as N
from tests.oracles import np_greedy_nms, np_iou, np_soft_nms

pytestmark = pytest.mark.fast


def _rand_boxes(rng, n, size=100.0):
    b = rng.uniform(0, size, (n, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(1, size / 2, (n, 2))
    return b


def test_nms_matches_oracle(rng):
    boxes = _rand_boxes(rng, 200)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    keep_idx, keep_score, keep_valid = jax.jit(
        lambda b, s: N.nms(b, s, 0.5, 64)
    )(jnp.asarray(boxes), jnp.asarray(scores))
    ref = np_greedy_nms(boxes, scores, 0.5)
    k = min(len(ref), 64)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got[:k], ref[:k])
    np.testing.assert_allclose(
        np.asarray(keep_score)[np.asarray(keep_valid)][:k], scores[ref[:k]], rtol=1e-6
    )


def test_nms_with_padding(rng):
    boxes = _rand_boxes(rng, 50)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    # pad to 80 with -inf scores
    pb = np.concatenate([boxes, np.zeros((30, 4), np.float32)])
    ps = np.concatenate([scores, np.full(30, -np.inf, np.float32)])
    keep_idx, _, keep_valid = N.nms(jnp.asarray(pb), jnp.asarray(ps), 0.5, 60)
    ref = np_greedy_nms(boxes, scores, 0.5)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, ref[:len(got)])
    assert (got < 50).all()


def test_batched_nms_separates_ids(rng):
    boxes = _rand_boxes(rng, 100)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    ids = rng.randint(0, 3, 100)
    keep_idx, _, keep_valid = N.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(ids), 0.5, 100
    )
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    # oracle: run per-id NMS, merge by score order
    kept = []
    for i in range(3):
        sel = np.where(ids == i)[0]
        k = np_greedy_nms(boxes[sel], scores[sel], 0.5)
        kept.extend(sel[k])
    kept = sorted(kept, key=lambda j: -scores[j])
    np.testing.assert_array_equal(got, kept)


def test_soft_nms_matches_oracle(rng):
    boxes = _rand_boxes(rng, 60)
    scores = rng.uniform(0.1, 1, 60).astype(np.float32)
    keep_idx, keep_score, keep_valid = N.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.5,
        min_score=0.05, method="linear", max_out=60,
    )
    ref_idx, ref_scores = np_soft_nms(boxes, scores, 0.5, 0.05, "linear")
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    k = min(len(ref_idx), len(got))
    np.testing.assert_array_equal(got[:k], ref_idx[:k])
    np.testing.assert_allclose(
        np.asarray(keep_score)[np.asarray(keep_valid)][:k], ref_scores[:k], rtol=1e-4
    )


def test_multiclass_nms(rng):
    n, c = 80, 5
    boxes = _rand_boxes(rng, n)
    logits = rng.normal(0, 1, (n, c + 1)).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    db, ds, dl, dv = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, 20
    )
    # oracle: per-class greedy NMS on above-threshold candidates
    cand = []
    for cls in range(c):
        s = scores[:, cls]
        sel = np.where(s > 0.05)[0]
        if len(sel) == 0:
            continue
        k = np_greedy_nms(boxes[sel], s[sel], 0.5)
        for j in sel[k]:
            cand.append((s[j], j, cls))
    cand.sort(key=lambda t: -t[0])
    cand = cand[:20]
    nv = int(np.asarray(dv).sum())
    assert nv == len(cand)
    got_scores = np.asarray(ds)[:nv]
    np.testing.assert_allclose(got_scores, [t[0] for t in cand], rtol=1e-5)
    got_labels = np.asarray(dl)[:nv]
    np.testing.assert_array_equal(got_labels, [t[2] for t in cand])
    got_boxes = np.asarray(db)[:nv]
    np.testing.assert_allclose(got_boxes, boxes[[t[1] for t in cand]], rtol=1e-5)


def test_blocked_nms_matches_oracle_large(rng):
    n = 700  # > 2*tile with tile=256 path... force blocked explicitly
    boxes = _rand_boxes(rng, n, size=300.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    # inject score ties to exercise tie-breaking
    scores[100:120] = scores[50]
    keep_idx, keep_score, keep_valid = N.nms_blocked(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 256, tile=128
    )
    ref = np_greedy_nms(boxes, scores, 0.5)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    k = min(len(ref), 256)
    np.testing.assert_array_equal(got[:k], ref[:k])


def test_blocked_equals_argmax(rng):
    n = 600
    boxes = _rand_boxes(rng, n, size=120.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    scores[::7] = -np.inf  # padded entries
    a = N.nms_argmax(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 128)
    b = N.nms_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 128, tile=64)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    va = np.asarray(a[2])
    np.testing.assert_array_equal(np.asarray(a[0])[va], np.asarray(b[0])[va])
    np.testing.assert_allclose(np.asarray(a[1])[va], np.asarray(b[1])[va], rtol=1e-6)
