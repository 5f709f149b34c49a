"""High-level APIs: init / single-image inference / dataset evaluation.

Behavioral spec: reference mmdet/apis (inference.py:16-124 init+infer,
test.py:16-190 dataset test loop + result collection, train.py:35-150).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from htd_tpu.config import HTDConfig


def init_detector(
    cfg: HTDConfig,
    checkpoint: Optional[str] = None,
    calibrate: str = "auto",
    calib_images=None,
):
    """Build the model and its variables (from a checkpoint if given).

    Checkpoint may be an mmdet .pth (converted on the fly) or an orbax dir.
    Returns (model, variables).

    DCN dispatch calibration (PERF.md "DCN window fidelity contract"): a
    trained checkpoint's offset convs can emit offsets that escape the
    windowed Pallas kernel's select-MAC window; beyond-cap samples are
    silently zeroed. With `calibrate="auto"` (default), loading a
    checkpoint into a DCN config runs `calibrate_dcn` and applies the
    recommended impl / HTD_DCN_FB_CAP / window via env vars, preferring
    the faster asym window when the measured offset mass clears it.
    Explicitly-set HTD_DCN_IMPL / HTD_DCN_FB_CAP / HTD_DCN_WIN env vars
    are the escape hatch — calibration is skipped so user choices stick.
    `calib_images` (one (N,H,W,3) batch or an iterable, pipeline-
    normalized) should be real deployment images when available; defaults
    to a synthetic normalized-noise probe batch. `calibrate="off"`
    disables.
    """
    import jax
    import jax.numpy as jnp

    from htd_tpu.models.detector import HTDDetector

    model = HTDDetector(cfg)
    if checkpoint and checkpoint.endswith(".pth"):
        from htd_tpu.train.checkpoint import load_torch_checkpoint

        variables = load_torch_checkpoint(checkpoint, cfg)
    else:
        init_fn = jax.jit(
            lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf)
        )
        variables = init_fn(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.asarray([[64.0, 64.0]]),
            jnp.ones((1, 4)),
        )
        if checkpoint:
            from htd_tpu.train.checkpoint import restore_checkpoint

            variables = restore_checkpoint(checkpoint, variables)
    if checkpoint and calibrate == "auto" and any(cfg.backbone.stage_with_dcn):
        _auto_calibrate_dcn(model, variables, calib_images)
    return model, variables


def _auto_calibrate_dcn(model, variables, calib_images=None) -> None:
    """Measure trained-offset statistics and pick the DCN dispatch.

    Decision ladder (cost data: PERF.md "DCN correction-cap cost ladder" —
    asym window is +12% on the flagship, cap 512 costs 2.8%, cap 2048
    costs 15%, gather is the exact fallback):
      1. asym window [-1, 0) if its needed correction cap is <= 512;
      2. else sym window [-1, 1] if its cap is <= 2048;
      3. else the exact gather path.
    Skipped (with a note) when the user already set any HTD_DCN_* env.
    """
    import os
    import sys

    explicit = [k for k in ("HTD_DCN_IMPL", "HTD_DCN_FB_CAP", "HTD_DCN_WIN")
                if os.environ.get(k)]
    if explicit:
        print(f"[calibrate_dcn] skipped: {', '.join(explicit)} set "
              f"explicitly (escape hatch)", file=sys.stderr)
        return
    if calib_images is None:
        # Synthetic probe: pipeline-normalized images are ~N(0,1) per
        # channel; 4 noise images at a moderate size exercise every DCN
        # conv's offset statistics. Real val images are better — tools
        # pass them — but trained offset magnitudes are dominated by the
        # weights, so noise catches the saturating regimes too.
        rng = np.random.RandomState(0)
        calib_images = rng.normal(0, 1, (4, 512, 704, 3)).astype(np.float32)
    captured = _capture_dcn_offsets(model, variables, calib_images)
    if not captured:
        return
    _, rec_asym = _dcn_offset_stats(captured, (-1, 0))
    per_sym, rec_sym = _dcn_offset_stats(captured, (-1, 1))
    if rec_asym["impl"] == "pallas" and rec_asym["fb_cap"] <= 512:
        decision = {"HTD_DCN_WIN": "asym",
                    "HTD_DCN_FB_CAP": str(max(128, rec_asym["fb_cap"]))}
    elif rec_sym["impl"] == "pallas" and rec_sym["fb_cap"] <= 2048:
        decision = {"HTD_DCN_FB_CAP": str(max(128, rec_sym["fb_cap"]))}
    else:
        decision = {"HTD_DCN_IMPL": "gather"}
    os.environ.update(decision)
    worst = max(
        (v["abs_off_p99"] for v in per_sym.values()), default=0.0)
    print(f"[calibrate_dcn] abs_off_p99={worst:.2f}, "
          f"asym cap={rec_asym.get('fb_cap')}, sym cap={rec_sym.get('fb_cap')}"
          f" -> {decision}", file=sys.stderr)


def make_inference_fn(model, variables, mesh=None):
    """Returns a jitted fn(images, img_shapes, scale_factors) -> Detections.

    One compilation per input bucket shape (XLA caches by shape).

    mesh: optional `jax.sharding.Mesh` with a 'data' axis — batch-parallel
    multi-chip inference on one host (the reference `multi_gpu_test` analog
    for N local devices): params replicated, batch sharded on 'data', XLA
    partitions the whole forward. Batch size must be a multiple of the
    mesh size (grouped_batches pads short batches to full size).
    """
    import functools

    import jax

    @jax.jit
    def fwd_v(v, images, img_shapes, scale_factors):
        return model.apply(v, images, img_shapes, scale_factors)

    if mesh is None:
        return functools.partial(fwd_v, variables)

    from htd_tpu.parallel.mesh import replicated, shard_pytree_batch

    variables = jax.device_put(variables, replicated(mesh))

    def fwd(images, img_shapes, scale_factors):
        images, img_shapes, scale_factors = shard_pytree_batch(
            mesh, (images, img_shapes, scale_factors)
        )
        return fwd_v(variables, images, img_shapes, scale_factors)

    return fwd


def inference_detector(
    model,
    variables,
    img_bgr: np.ndarray,
    scale: Optional[Tuple[int, int]] = None,
    fwd=None,
):
    """Single-image inference. Returns (boxes (k,4), scores (k,), labels (k,))
    in original-image coordinates (reference apis/inference.py:82).

    `scale` defaults to the model config's test_scale (per-model test
    resolution, e.g. (1600, 800) for X-101-DCN)."""
    import jax.numpy as jnp

    from htd_tpu.data.pipeline import bucket_shape, preprocess

    scale = scale or model.cfg.test_scale
    landscape = img_bgr.shape[1] >= img_bgr.shape[0]
    bucket = bucket_shape(scale, landscape)
    p = preprocess(img_bgr, scale=scale, bucket=bucket)
    fwd = fwd or make_inference_fn(model, variables)
    dets = fwd(
        jnp.asarray(p.image[None]),
        jnp.asarray(p.img_shape[None]),
        jnp.asarray(p.scale_factor[None]),
    )
    v = np.asarray(dets.valid[0])
    return (
        np.asarray(dets.boxes[0])[v],
        np.asarray(dets.scores[0])[v],
        np.asarray(dets.labels[0])[v],
    )


_TTA_JIT_CACHE: Dict = {}


def aug_inference_detector(
    model,
    variables,
    img_bgr: np.ndarray,
    scales: Optional[Sequence[Tuple[int, int]]] = None,
    flip: bool = True,
):
    """Multi-scale + flip TTA inference for one image.

    Behavioral spec: MultiScaleFlipAug expansion (scales outer, [no-flip,
    flip] inner) -> merge_aug_proposals -> per-aug cascade -> mean of
    recovered boxes/scores -> multiclass NMS (reference aug_test path).
    Returns (boxes, scores, labels) in original-image coordinates.
    """
    import jax
    import jax.numpy as jnp

    from htd_tpu.data.pipeline import bucket_shape, preprocess
    from htd_tpu.models import tta

    def jitted(name):
        # Cache key = (config repr, method): one jit per distinct model
        # CONFIG, not per (model, variables) object pair — rebuilding
        # variables (or the model object) reuses the traced program, and
        # the cache cannot grow with object churn (VERDICT r04 item on
        # id()-keyed TTA caching). Variables are passed per call, so XLA
        # retraces only on input shape change (per aug bucket).
        key = (repr(model.cfg), name)
        if key not in _TTA_JIT_CACHE:
            method = getattr(model, name)
            _TTA_JIT_CACHE[key] = jax.jit(
                lambda v, *a: model.apply(v, *a, method=method)
            )
        jf = _TTA_JIT_CACHE[key]
        return lambda *a: jf(variables, *a)

    scales = scales or (model.cfg.test_scale,)
    landscape = img_bgr.shape[1] >= img_bgr.shape[0]
    augs = []  # (processed, flip)
    for scale in scales:
        for fl in ([False, True] if flip else [False]):
            p = preprocess(
                img_bgr, scale=scale, bucket=bucket_shape(scale, landscape), flip=fl
            )
            augs.append((p, fl))

    # 1) per-aug proposals, mapped back to the original frame
    prop_b, prop_s, prop_v = [], [], []
    for p, fl in augs:
        boxes, scores, valid = jitted("rpn_proposals")(
            jnp.asarray(p.image[None]), jnp.asarray(p.img_shape[None])
        )
        back = tta.map_back(boxes[0], jnp.asarray(p.img_shape), p.scale_factor, fl)
        prop_b.append(back)
        prop_s.append(scores[0])
        prop_v.append(valid[0])
    merged, merged_scores, merged_valid = tta.merge_aug_proposals(
        prop_b, prop_s, prop_v, model.cfg.proposal_test
    )

    # 2) per-aug cascade on the merged proposals
    aug_boxes, aug_scores = [], []
    for p, fl in augs:
        rois = tta.map_into(merged, jnp.asarray(p.img_shape), p.scale_factor, fl)
        boxes, scores = jitted("stages_forward")(
            jnp.asarray(p.image[None]),
            jnp.asarray(p.img_shape[None]),
            rois[None],
            merged_valid[None],
        )
        aug_boxes.append(
            tta.map_back(boxes[0], jnp.asarray(p.img_shape), p.scale_factor, fl)
        )
        aug_scores.append(scores[0])

    boxes, scores = tta.merge_aug_bboxes(aug_boxes, aug_scores)
    db, ds, dl, dv = tta.final_nms(boxes, scores, merged_valid, model.cfg.rcnn_test)
    v = np.asarray(dv)
    return np.asarray(db)[v], np.asarray(ds)[v], np.asarray(dl)[v]


def evaluate_proposals(
    model,
    variables,
    dataset,
    batch_size: int = 8,
    scale: Optional[Tuple[int, int]] = None,
    max_images: Optional[int] = None,
    proposal_nums: Sequence[int] = (100, 300, 1000),
):
    """Standalone RPN proposal-recall eval (reference 'proposal_fast'
    metric: CocoDataset.evaluate -> fast_eval_recall, coco.py:312-330,
    and the RPN proposal-only detector, detectors/rpn.py).

    Returns {'AR@100': ..., 'AR@300': ..., 'AR@1000': ...} at IoU
    0.5:0.95 (the reference's eval_recalls default thresholds).
    """
    import jax
    import jax.numpy as jnp

    from htd_tpu.data.coco import grouped_batches, make_test_batch
    from htd_tpu.data.mean_ap import eval_recalls

    scale = scale or model.cfg.test_scale

    @jax.jit
    def fwd(v, images, img_shapes):
        return model.apply(v, images, img_shapes, method=model.rpn_proposals)

    gt = dataset.groundtruth()
    gts, props = [], []
    seen = 0
    for records in grouped_batches(dataset, batch_size, shuffle=False):
        if max_images is not None and seen >= max_images:
            break
        images, shapes, sfs, ids = make_test_batch(
            dataset, records, scale=scale, batch_size=batch_size
        )
        boxes, scores, valid = fwd(
            variables, jnp.asarray(images), jnp.asarray(shapes)
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        for i, img_id in enumerate(ids):
            if img_id < 0:
                continue
            if max_images is not None and seen >= max_images:
                break  # keep reported AR independent of batch_size
            m = valid[i]
            # proposals are in the resized frame; recall is evaluated in
            # original-image coords like the reference (rescale by sf)
            b = boxes[i][m] / np.asarray(sfs[i], np.float32)
            s = scores[i][m]
            props.append(np.concatenate([b, s[:, None]], axis=1))
            g_boxes, _, g_crowd = gt[int(img_id)]
            gts.append(g_boxes[~g_crowd])  # crowds excluded (reference
            # fast_eval_recall uses get_ann_info bboxes, non-crowd only)
            seen += 1
    iou_thrs = np.arange(0.5, 0.96, 0.05)
    rec = eval_recalls(gts, props, proposal_nums, iou_thrs)
    return {f"AR@{n}": float(rec[i].mean()) for i, n in enumerate(proposal_nums)}


def evaluate_dataset(
    model,
    variables,
    dataset,
    batch_size: int = 8,
    scale: Optional[Tuple[int, int]] = None,
    max_images: Optional[int] = None,
    log_every: int = 50,
    return_detections: bool = False,
    mesh=None,
):
    """COCO val loop: batched static-bucket inference + native COCO mAP.

    `scale` defaults to the model config's test_scale. `mesh` enables
    single-host multi-chip batch-parallel inference (see
    make_inference_fn)."""
    import jax.numpy as jnp

    from htd_tpu.data.coco import grouped_batches, make_test_batch
    from htd_tpu.data.coco_eval import evaluate_coco_map

    import jax

    scale = scale or model.cfg.test_scale
    if model.cfg.roi_extractor.max_samples < 8:
        import sys

        print(
            f"[eval] model built with the serving RoIAlign preset "
            f"(roi_extractor.max_samples="
            f"{model.cfg.roi_extractor.max_samples}); for exact mmcv "
            f"sampling_ratio=0 accuracy build with max_samples=8 "
            f"(tools/test.py does this by default)", file=sys.stderr,
        )
    fwd = make_inference_fn(model, variables, mesh=mesh)
    detections: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    seen = 0
    t0 = time.time()
    # multi-host: round-robin batch shard per process; detections gathered
    # after the loop (reference multi_gpu_test + padded collection,
    # apis/test.py:69,160-190)
    pc = jax.process_count()
    pid = jax.process_index()
    gathered: list = []
    for bi, records in enumerate(grouped_batches(dataset, batch_size, shuffle=False)):
        if pc > 1 and bi % pc != pid:
            continue
        if max_images is not None and seen >= max_images:
            break
        images, shapes, sfs, ids = make_test_batch(
            dataset, records, scale=scale, batch_size=batch_size
        )
        dets = fwd(jnp.asarray(images), jnp.asarray(shapes), jnp.asarray(sfs))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        valid = np.asarray(dets.valid)
        if pc > 1:
            gathered.append((boxes, scores, labels, valid, np.asarray(ids)))
        for i, img_id in enumerate(ids):
            if img_id < 0:
                continue
            m = valid[i]
            detections[int(img_id)] = (boxes[i][m], scores[i][m], labels[i][m])
            seen += 1
        if log_every and seen % log_every < batch_size and pid == 0:
            dt = time.time() - t0
            print(f"[eval] {seen} imgs, {seen / max(dt, 1e-9):.2f} img/s")

    if pc > 1:
        from htd_tpu.parallel.mesh import gather_detections

        # pad every host to the same batch count so allgather shapes agree
        from jax.experimental import multihost_utils

        n_batches = int(
            multihost_utils.process_allgather(np.asarray(len(gathered))).max()
        )
        shape = (
            gathered[0][0].shape if gathered
            else (batch_size, model.cfg.rcnn_test.max_per_img)
        )
        while len(gathered) < n_batches:
            b, p = shape[0], shape[1]
            gathered.append((
                np.zeros((b, p, 4), np.float32), np.zeros((b, p), np.float32),
                np.zeros((b, p), np.int32), np.zeros((b, p), bool),
                np.full((b,), -1, np.int64),
            ))
        cat = [np.concatenate([g[j] for g in gathered]) for j in range(5)]
        boxes, scores, labels, valid, ids = gather_detections(*cat)
        detections = {}
        for i, img_id in enumerate(ids):
            if img_id < 0:
                continue
            m = valid[i]
            detections[int(img_id)] = (boxes[i][m], scores[i][m], labels[i][m])

    gt = dataset.groundtruth()
    gt = {k: v for k, v in gt.items() if k in detections}
    metrics = evaluate_coco_map(
        detections, gt, num_classes=len(dataset.cat_ids) or 80
    )
    if return_detections:
        return metrics, detections
    return metrics


def calibrate_dcn(model, variables, images, window=(-1, 1)):
    """Measure per-DCN-conv out-of-window sample statistics on a batch.

    The windowed DCN kernel resolves samples whose floor displacement
    escapes its window through an exact correction capped at
    HTD_DCN_FB_CAP flagged pixels per image per conv; beyond-cap samples
    contribute zero (PERF.md "DCN window fidelity contract"). This probe
    runs the backbone on REAL images, captures every offset-conv output,
    and reports per-conv flag statistics plus a dispatch recommendation —
    run it once after converting a trained checkpoint (init_detector does
    this automatically for .pth checkpoints of DCN configs).

    `images` is one (N, H, W, 3) batch or an iterable of such batches;
    statistics aggregate over everything given. Because the recommended
    cap extrapolates from the calibration batch's per-image worst case
    (1.5x + 16 headroom), a too-small or unrepresentative batch can
    under-estimate it — use >= 4 images spanning the deployment's content
    variety (e.g. one val batch), not a single frame.

    Returns (per_conv, recommendation) where per_conv maps
    "layerX_i" -> {"flag_rate", "flagged_px_per_img_p100", "abs_off_p99"}
    and recommendation is {"impl", "fb_cap"} ("gather" when the needed
    cap would exceed ~25% of the map — the correction gather would cost
    more than it saves).
    """
    captured = _capture_dcn_offsets(model, variables, images)
    return _dcn_offset_stats(captured, window)


def _capture_dcn_offsets(model, variables, images):
    """Run the backbone and capture every offset-conv output.

    The probe must see UNSATURATED activations: a capped windowed run
    zeroes beyond-cap samples, corrupting the inputs of later offset
    convs, so the probe itself runs on the exact gather path.
    """
    import os

    def keep(mdl, method_name):
        return mdl.name == "conv_offset" and method_name == "__call__"

    def walk(tree, path, out):
        if isinstance(tree, (tuple, list)):
            out.append(("/".join(path), tree[0]))
            return
        for k, v in tree.items():
            walk(v, path + [k], out)

    batches = [images] if hasattr(images, "shape") else list(images)
    prev = os.environ.get("HTD_DCN_IMPL")
    os.environ["HTD_DCN_IMPL"] = "gather"
    try:
        captured = []
        for batch in batches:
            _, state = model.apply(
                variables, batch, method=model.extract_feats,
                capture_intermediates=keep, mutable=["intermediates"],
            )
            walk(state["intermediates"], [], captured)
    finally:
        if prev is None:
            os.environ.pop("HTD_DCN_IMPL", None)
        else:
            os.environ["HTD_DCN_IMPL"] = prev
    return captured


def _dcn_offset_stats(captured, window):
    lo, hi = window
    per_conv = {}
    worst_cap = 0
    worst_frac = 0.0
    for path, off in captured:
        off = np.asarray(off, np.float32)
        n, h, w = off.shape[:3]
        o = off.reshape(n, h, w, -1, 2)
        disp = np.floor(o)
        oow = (disp < lo) | (disp > hi)
        flagged = oow.any(axis=(3, 4))           # (n, h, w)
        per_img = flagged.reshape(n, -1).sum(axis=1)
        name = path.split("/conv2")[0].split("/")[-1]
        st = per_conv.setdefault(name, {
            "flag_rate": 0.0, "flagged_px_per_img_p100": 0,
            "abs_off_p99": 0.0, "_n": 0,
        })
        k = st["_n"]
        st["flag_rate"] = (st["flag_rate"] * k + float(flagged.mean()) * n) / (k + n)
        st["flagged_px_per_img_p100"] = max(
            st["flagged_px_per_img_p100"], int(per_img.max()))
        st["abs_off_p99"] = max(
            st["abs_off_p99"], float(np.percentile(np.abs(o), 99)))
        st["_n"] = k + n
        worst_cap = max(worst_cap, int(per_img.max()))
        worst_frac = max(worst_frac, float(per_img.max()) / (h * w))
    for st in per_conv.values():
        st.pop("_n", None)
    if worst_frac > 0.25:
        rec = {"impl": "gather", "fb_cap": None}
    else:
        rec = {"impl": "pallas", "fb_cap": int(worst_cap * 1.5) + 16}
    return per_conv, rec
