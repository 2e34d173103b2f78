import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.models.centerpoint_head import (
    NUSCENES_CLASSES, NUSCENES_TASKS, CenterHead, centerpoint_decode,
    centerpoint_loss, centerpoint_targets, gaussian_focal_loss)
from fbbev_tpu.models.frpn import FRPN, bev_mask_loss
from fbbev_tpu.ops.boxes import boxes_bev_corners, circle_nms


PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
VOXEL = (0.8, 0.8)


def test_frpn(rng):
    m = FRPN(in_channels=32)
    x = jnp.asarray(rng.randn(2, 20, 20, 32).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == (2, 20, 20)
    gt = jnp.asarray(rng.rand(2, 20, 20) > 0.5)
    losses = bev_mask_loss(gt, logits)
    assert np.isfinite(float(losses["mask_ce_loss"]))
    assert 0 <= float(losses["mask_dice_loss"]) <= 1


def test_frpn_bce_matches_torch(rng):
    import torch
    logits = rng.randn(2, 10, 10).astype(np.float32)
    gt = (rng.rand(2, 10, 10) > 0.5)
    ours = float(bev_mask_loss(jnp.asarray(gt), jnp.asarray(logits))
                 ["mask_ce_loss"])
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([2.13]))(
        torch.from_numpy(logits.reshape(-1, 1)),
        torch.from_numpy(gt.reshape(-1, 1).astype(np.float32))).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_circle_nms():
    centers = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [10.0, 0.0], [10.5, 0.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = circle_nms(centers, scores, 2.0)
    assert keep.tolist() == [True, False, True, False]


def test_centerpoint_targets_and_loss(rng):
    B, M = 2, 8
    boxes = np.zeros((B, M, 9), np.float32)
    labels = np.full((B, M), -1, np.int64)
    # one car at (8, -4), one pedestrian at (-12, 20)
    boxes[0, 0] = [8.0, -4.0, 0.5, 4.0, 2.0, 1.6, 0.3, 1.0, 0.0]
    labels[0, 0] = NUSCENES_CLASSES.index("car")
    boxes[0, 1] = [-12.0, 20.0, 0.2, 0.8, 0.8, 1.8, 0.0, 0.0, 0.0]
    labels[0, 1] = NUSCENES_CLASSES.index("pedestrian")
    targets = centerpoint_targets(
        jnp.asarray(boxes), jnp.asarray(labels), NUSCENES_TASKS,
        NUSCENES_CLASSES, (100, 100), PC_RANGE, VOXEL)
    assert len(targets) == 6
    hm_car = np.asarray(targets[0]["heatmap"])
    cxi, cyi = int((8 + 40) / 0.8), int((-4 + 40) / 0.8)
    assert hm_car[0, cyi, cxi, 0] == 1.0
    assert hm_car[1].max() == 0.0  # sample 1 has no objects
    ped_t = targets[5]
    assert bool(ped_t["mask"][0, 1])
    assert not bool(ped_t["mask"][0, 0])

    head = CenterHead(in_channels=32)
    bev = jnp.asarray(rng.randn(B, 100, 100, 32).astype(np.float32))
    v = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(v, bev)
    losses = centerpoint_loss(preds, targets)
    for k_, l in losses.items():
        assert np.isfinite(float(l)), k_


def test_centerpoint_decode_recovers_gt(rng):
    """A head output constructed from the targets must decode back to the
    GT box."""
    B, M = 1, 4
    boxes = np.zeros((B, M, 9), np.float32)
    labels = np.full((B, M), -1, np.int64)
    boxes[0, 0] = [8.0, -4.0, 0.5, 4.0, 2.0, 1.6, 0.3, 1.0, -0.5]
    labels[0, 0] = NUSCENES_CLASSES.index("car")
    targets = centerpoint_targets(
        jnp.asarray(boxes), jnp.asarray(labels), NUSCENES_TASKS,
        NUSCENES_CLASSES, (100, 100), PC_RANGE, VOXEL)

    preds = []
    for t, tgt in enumerate(targets):
        hm = np.asarray(tgt["heatmap"])
        logit = np.where(hm >= 0.999, 8.0, -8.0).astype(np.float32)
        H, W, Ct = hm.shape[1:]
        reg = np.zeros((B, H, W, 10), np.float32)
        anno = np.asarray(tgt["anno"])
        inds = np.asarray(tgt["inds"])
        mask = np.asarray(tgt["mask"])
        for b in range(B):
            for m in range(M):
                if mask[b, m]:
                    yy, xx = inds[b, m] // W, inds[b, m] % W
                    reg[b, yy, xx] = anno[b, m]
        preds.append(dict(
            heatmap=jnp.asarray(logit),
            reg=jnp.asarray(reg[..., 0:2]), height=jnp.asarray(reg[..., 2:3]),
            dim=jnp.asarray(reg[..., 3:6]), rot=jnp.asarray(reg[..., 6:8]),
            vel=jnp.asarray(reg[..., 8:10])))

    out_boxes, scores, out_labels = centerpoint_decode(
        preds, NUSCENES_TASKS, PC_RANGE, VOXEL, k=10)
    best = int(jnp.argmax(scores))
    b = np.asarray(out_boxes)[best]
    np.testing.assert_allclose(b[0], 8.0, atol=0.5)
    np.testing.assert_allclose(b[1], -4.0, atol=0.5)
    np.testing.assert_allclose(b[2], 0.5, atol=1e-3)
    np.testing.assert_allclose(b[3:6], [4.0, 2.0, 1.6], rtol=1e-3)
    np.testing.assert_allclose(b[6], 0.3, atol=1e-3)
    np.testing.assert_allclose(b[7:9], [1.0, -0.5], atol=1e-4)
    assert int(out_labels[best]) == NUSCENES_CLASSES.index("car")


def test_boxes_bev_corners():
    boxes = jnp.asarray([[0.0, 0, 0, 4, 2, 1, 0, 0, 0]])
    corners = np.asarray(boxes_bev_corners(boxes))[0]
    assert sorted(corners[:, 0].tolist()) == [-2, -2, 2, 2]
    assert sorted(corners[:, 1].tolist()) == [-1, -1, 1, 1]


def test_detection_metric_perfect():
    from fbbev_tpu.evaluation.det_metrics import DetectionMetric
    classes = ["car", "pedestrian"]
    m = DetectionMetric(classes)
    gt = np.array([[5, 5, 0, 4, 2, 1.5, 0.3, 1, 0],
                   [-8, 2, 0, 0.8, 0.8, 1.8, 0.0, 0, 0]], np.float32)
    gl = np.array([0, 1])
    m.add_sample(gt.copy(), np.array([0.9, 0.8]), gl.copy(), gt, gl)
    res = m.compute()
    assert res["mAP"] > 0.95
    assert res["mATE"] < 1e-6 and res["mASE"] < 1e-6
    assert res["NDS"] > 0.97


def test_detection_metric_misses_and_fps():
    from fbbev_tpu.evaluation.det_metrics import DetectionMetric
    classes = ["car"]
    m = DetectionMetric(classes)
    gt = np.array([[5, 5, 0, 4, 2, 1.5, 0.0, 0, 0]], np.float32)
    # one far false positive, one miss of a second GT
    preds = np.array([[30, 30, 0, 4, 2, 1.5, 0.0, 0, 0]], np.float32)
    m.add_sample(preds, np.array([0.9]), np.array([0]), gt, np.array([0]))
    res = m.compute()
    assert res["mAP"] == 0.0
    assert res["NDS"] < 0.1


def test_detection_metric_offset_errors():
    from fbbev_tpu.evaluation.det_metrics import DetectionMetric
    m = DetectionMetric(["car"])
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0, 1.0, 0]], np.float32)
    pred = gt.copy()
    pred[0, 0] += 1.5   # 1.5m center error: matches at 2m/4m, not 0.5/1
    m.add_sample(pred, np.array([0.9]), np.array([0]), gt, np.array([0]))
    res = m.compute()
    assert 0.4 < res["mAP"] < 0.6  # 2 of 4 thresholds match
    np.testing.assert_allclose(res["mATE"], 1.5, atol=1e-6)


def test_detection_metric_aae():
    """AAE term (nuscenes_eval.py:569+ TP set; attribute heuristic
    nuscenes_dataset.py:496-515): wrong motion state costs attr error;
    attribute-less classes are excluded from mAAE."""
    from fbbev_tpu.evaluation.det_metrics import (DetectionMetric,
                                                  derive_attribute)

    assert derive_attribute("car", 3.0, 0.0) == "vehicle.moving"
    assert derive_attribute("car", 0.0, 0.0) == "vehicle.parked"
    assert derive_attribute("pedestrian", 0.0, 0.0) == "pedestrian.standing"
    assert derive_attribute("bicycle", 1.0, 0.0) == "cycle.with_rider"
    assert derive_attribute("barrier", 0.0, 0.0) == ""

    m = DetectionMetric(["car", "barrier"])
    gt = np.zeros((2, 9), np.float32)
    gt[0, 3:6] = [4, 2, 1.6]
    gt[0, 7] = 5.0  # moving car
    gt[1, 0] = 10.0
    gt[1, 3:6] = [2, 0.5, 1.0]  # barrier (no attribute)
    pred = gt.copy()
    pred[0, 7] = 0.0  # predicted stationary -> attr mismatch
    m.add_sample(pred, np.array([0.9, 0.8]), np.array([0, 1]),
                 gt, np.array([0, 1]))
    res = m.compute()
    assert res["mAAE"] == 1.0  # the one attr-valid TP is wrong
    # NDS averages 5 TP errors (devkit formula)
    tp_sum = sum(1.0 - min(1.0, res[f"m{k}"])
                 for k in ("ATE", "ASE", "AOE", "AVE", "AAE"))
    np.testing.assert_allclose(res["NDS"], (5 * res["mAP"] + tp_sum) / 10,
                               atol=1e-6)

    m2 = DetectionMetric(["car"])
    m2.add_sample(gt[:1], np.array([0.9]), np.array([0]),
                  gt[:1], np.array([0]))
    assert m2.compute()["mAAE"] == 0.0


def test_rotated_iou_monte_carlo():
    """rotated_iou vs a point-sampling oracle on random rotated boxes."""
    from fbbev_tpu.ops.boxes import rotated_iou

    rng = np.random.RandomState(0)
    N = 12
    boxes = np.stack([
        rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
        rng.uniform(0.5, 3, N), rng.uniform(0.5, 3, N),
        rng.uniform(-np.pi, np.pi, N)], axis=1).astype(np.float32)

    got = np.asarray(rotated_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    assert np.allclose(np.diag(got), 1.0, atol=1e-4)

    # Monte-Carlo oracle
    pts = rng.uniform(-5, 5, size=(200000, 2)).astype(np.float32)

    def inside(b):
        d = pts - b[:2]
        c, s = np.cos(b[4]), np.sin(b[4])
        lx = c * d[:, 0] + s * d[:, 1]
        ly = -s * d[:, 0] + c * d[:, 1]
        return (np.abs(lx) <= b[2] / 2) & (np.abs(ly) <= b[3] / 2)

    masks = np.stack([inside(b) for b in boxes])
    for i in range(N):
        for j in range(i + 1, N):
            inter = np.sum(masks[i] & masks[j])
            union = np.sum(masks[i] | masks[j])
            ref = inter / max(union, 1)
            assert abs(got[i, j] - ref) < 0.02, (i, j, got[i, j], ref)
            assert abs(got[i, j] - got[j, i]) < 1e-4


def test_nms_rotated_axis_aligned():
    from fbbev_tpu.ops.boxes import nms_rotated

    boxes = jnp.asarray([
        [0.0, 0.0, 2.0, 2.0, 0.0],     # kept (highest score)
        [0.1, 0.0, 2.0, 2.0, 0.0],     # IoU ~0.82 -> suppressed
        [5.0, 5.0, 2.0, 2.0, 1.0],     # far away -> kept
        [0.0, 0.0, 2.0, 2.0, np.pi/2], # same square rotated 90deg -> sup
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_rotated(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True, False]
