"""Occupancy mIoU evaluation.

Parity reference: ``Metric_mIoU``
(``/root/reference/mmdet3d/datasets/occ_metrics.py:50-179``): 18-class
confusion matrix (17 semantics + free) over camera-visible voxels, with a
radial distance gate on the BEV plane; mIoU averages classes 0..16
(``count_miou`` excludes the free class).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

CLASS_NAMES = [
    "others", "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation", "free",
]


class MIoUMetric:
    def __init__(self, num_classes: int = 18, use_image_mask: bool = True,
                 min_d: float = -1.0, max_d: float = 100.0,
                 bev_extent_m: float = 80.0):
        self.num_classes = num_classes
        self.use_image_mask = use_image_mask
        self.hist = np.zeros((num_classes, num_classes), np.int64)
        self.cnt = 0
        self.min_d, self.max_d = min_d, max_d
        self.bev_extent_m = bev_extent_m
        self._gate = {}

    def _distance_gate(self, hw: int) -> np.ndarray:
        """Radial gate for an hw x hw BEV (reference: 200 cells x 0.4 m)."""
        if hw not in self._gate:
            voxel = self.bev_extent_m / hw
            xx, yy = np.meshgrid(np.arange(hw), np.arange(hw))
            dist = np.linalg.norm(
                (np.stack([yy, xx], -1) - hw / 2) * voxel, axis=-1)
            self._gate[hw] = (dist <= self.max_d) & (dist >= self.min_d)
        return self._gate[hw]

    def add_batch(self, semantics_pred: np.ndarray, semantics_gt: np.ndarray,
                  mask_camera: Optional[np.ndarray] = None):
        """Args: (H, W, Z) int label volumes in CVPR2023 axes."""
        self.cnt += 1
        if mask_camera is None:
            mask_camera = np.ones(semantics_gt.shape, bool)
        mask = mask_camera & self._distance_gate(
            semantics_gt.shape[0])[:, :, None]
        gt = semantics_gt[mask]
        pred = semantics_pred[mask]
        k = (gt >= 0) & (gt < self.num_classes)
        self.hist += np.bincount(
            self.num_classes * gt[k].astype(np.int64) + pred[k].astype(
                np.int64),
            minlength=self.num_classes ** 2,
        ).reshape(self.num_classes, self.num_classes)

    def per_class_iou(self) -> np.ndarray:
        diag = np.diag(self.hist)
        denom = self.hist.sum(1) + self.hist.sum(0) - diag
        with np.errstate(divide="ignore", invalid="ignore"):
            return diag / denom

    def count_miou(self) -> Dict[str, float]:
        iou = self.per_class_iou()
        res = {}
        for i in range(self.num_classes - 1):
            res[CLASS_NAMES[i]] = round(float(iou[i]) * 100, 2)
        res["Overall"] = round(
            float(np.nanmean(iou[: self.num_classes - 1])) * 100, 2)
        return res
