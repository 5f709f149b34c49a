import numpy as np
import pytest

import torch
import torch.nn.functional as F
import jax.numpy as jnp

from htd_tpu.train import losses as L

pytestmark = pytest.mark.fast


def test_softmax_ce_matches_torch(rng):
    logits = rng.normal(0, 2, (16, 5)).astype(np.float32)
    labels = rng.randint(0, 5, 16)
    w = (rng.uniform(0, 1, 16) > 0.3).astype(np.float32)
    ours = float(
        L.softmax_ce(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w), jnp.sum(w))
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    )
    ref = float((ref * torch.from_numpy(w)).sum() / w.sum())
    assert abs(ours - ref) < 1e-4


def test_sigmoid_bce_matches_torch(rng):
    logits = rng.normal(0, 3, (24,)).astype(np.float32)
    targets = rng.randint(0, 2, 24).astype(np.float32)
    w = np.ones(24, np.float32)
    ours = float(L.sigmoid_bce(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), 24.0))
    ref = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets), reduction="mean"
        )
    )
    assert abs(ours - ref) < 1e-4


def test_smooth_l1_matches_torch(rng):
    pred = rng.normal(0, 1, (12, 4)).astype(np.float32)
    tgt = rng.normal(0, 1, (12, 4)).astype(np.float32)
    for beta in (1.0, 1.0 / 9.0):
        ours = float(
            L.smooth_l1_loss(
                jnp.asarray(pred), jnp.asarray(tgt), jnp.ones((12, 1)), beta, 12.0
            )
        )
        ref = float(
            F.smooth_l1_loss(
                torch.from_numpy(pred), torch.from_numpy(tgt), reduction="sum", beta=beta
            )
            / 12.0
        )
        assert abs(ours - ref) < 1e-4


def test_multilabel_bce_matches_torch(rng):
    logits = rng.normal(0, 2, (2, 81)).astype(np.float32)
    targets = (rng.uniform(0, 1, (2, 81)) > 0.9).astype(np.float32)
    ours = float(L.multilabel_bce(jnp.asarray(logits), jnp.asarray(targets), 3.0))
    ref = 3.0 * float(
        torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(targets))
    )
    assert abs(ours - ref) < 1e-4


def test_accuracy():
    logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    labels = jnp.array([0, 1, 1])
    assert abs(float(L.accuracy(logits, labels)) - 2 / 3) < 1e-6
    w = jnp.array([1.0, 1.0, 0.0])
    assert abs(float(L.accuracy(logits, labels, w)) - 1.0) < 1e-6
