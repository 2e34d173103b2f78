import numpy as np
import pytest

from fbbev_tpu.data import (
    EvalGroupStreamSampler, InfiniteGroupStreamSampler, SyntheticClipDataset,
    collate, compute_sequence_flags)
from fbbev_tpu.data import transforms as T
from fbbev_tpu.evaluation import MIoUMetric, occ_pred_to_cvpr_format


def test_sequence_flags_split():
    infos = []
    for scene in range(2):
        for t in range(10):
            infos.append({"prev": [] if t == 0 else ["x"]})
    flags = compute_sequence_flags(infos, 1)
    assert flags.tolist() == [0] * 10 + [1] * 10
    flags2 = compute_sequence_flags(infos, 2)
    assert flags2.tolist() == [0] * 5 + [1] * 5 + [2] * 5 + [3] * 5


def test_stream_sampler_contract():
    """Every slot must stream one scene contiguously in order."""
    flags = np.repeat(np.arange(6), 5)  # 6 scenes x 5 frames
    sampler = InfiniteGroupStreamSampler(flags, batch_size=2, world_size=2,
                                         rank=0, seed=0)
    it = iter(sampler)
    history = [[] for _ in range(2)]
    for _ in range(12):
        batch = next(it)
        for slot, idx in enumerate(batch):
            history[slot].append(idx)
    for slot_hist in history:
        # split by scene: indices within a scene appear consecutively
        groups = [flags[i] for i in slot_hist]
        pos = [i % 5 for i in slot_hist]
        start = 0
        for k in range(1, len(groups) + 1):
            if k == len(groups) or groups[k] != groups[k - 1]:
                assert pos[start:k] == list(range(k - start)), (
                    slot_hist, groups, pos)
                start = k


def test_stream_sampler_disjoint_across_ranks():
    flags = np.repeat(np.arange(8), 3)
    s0 = iter(InfiniteGroupStreamSampler(flags, 2, world_size=2, rank=0))
    s1 = iter(InfiniteGroupStreamSampler(flags, 2, world_size=2, rank=1))
    b0 = next(s0)
    b1 = next(s1)
    g0 = {flags[i] for i in b0}
    g1 = {flags[i] for i in b1}
    assert not (g0 & g1)


def test_eval_sampler_covers_everything():
    flags = np.repeat(np.arange(5), 4)
    sampler = EvalGroupStreamSampler(flags, batch_size=3, world_size=1)
    seen = set()
    for idxs, valid in sampler:
        for i, v in zip(idxs, valid):
            if v:
                seen.add(i)
    assert seen == set(range(20))


def test_synthetic_dataset_schema():
    ds = SyntheticClipDataset(n_scenes=2, frames_per_scene=3,
                              input_size=(64, 176), occ_shape=(50, 50, 16))
    s0 = ds[0]
    assert s0["imgs"].shape == (6, 64, 176, 3)
    assert bool(s0["start_of_sequence"])
    s1 = ds[1]
    assert not bool(s1["start_of_sequence"])
    # ego moved forward: curr_to_prev has nonzero translation
    assert np.abs(s1["curr_to_prev_ego_rt"][:3, 3]).max() > 0.1
    batch = collate([ds[0], ds[3]])
    assert batch["imgs"].shape == (2, 6, 64, 176, 3)
    assert batch["start_of_sequence"].tolist() == [True, True]


def test_occ_axes_roundtrip(rng):
    """GT conversion (CVPR->bevdet) and pred conversion (bevdet->CVPR)
    must be exact inverses."""
    occ_cvpr = rng.randint(0, 18, size=(200, 200, 16)).astype(np.int32)
    bevdet = T.occupancy_to_bevdet_axes(occ_cvpr)
    # a perfect prediction in bevdet axes (+1 void shift)
    logits = np.eye(19, dtype=np.float32)[bevdet + 1]
    back = occ_pred_to_cvpr_format(logits, fix_void=True)
    np.testing.assert_array_equal(back, occ_cvpr)


def test_bda_matrix_and_boxes():
    m = T.bda_matrix(90.0, 1.0, False, False)
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0],
                               atol=1e-6)
    boxes = np.array([[1.0, 0, 0, 2, 1, 1, 0.0, 1.0, 0.0]], np.float32)
    out, rot = T.transform_boxes_bda(boxes, 90.0, 1.0, False, False)
    np.testing.assert_allclose(out[0, :3], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 6], np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(out[0, 7:9], [0, 1], atol=1e-6)


def test_post_homography_matches_pil(rng):
    """The accumulated homography must map source-image pixels to their
    transformed position, matching the PIL op chain."""
    from PIL import Image
    W0, H0 = 160, 90
    src = np.zeros((H0, W0), np.uint8)
    # a bright dot at a known position
    px, py = 100, 40
    src[py - 1:py + 2, px - 1:px + 2] = 255
    img = Image.fromarray(src)
    resize = 0.5
    resize_dims = (int(W0 * resize), int(H0 * resize))
    crop = (5, 3, 5 + 64, 3 + 32)
    for flip in (False, True):
        for rotate in (0.0, 10.0):
            out = T.apply_image_transform(img, resize_dims, crop, flip,
                                          rotate)
            pr, pt = T.update_post_homography(
                np.eye(2, dtype=np.float32), np.zeros(2, np.float32),
                resize, crop, flip, rotate)
            mapped = pr @ np.array([px, py], np.float32) + pt
            arr = np.asarray(out)
            ys, xs = np.nonzero(arr > 128)
            if len(xs) == 0:
                continue  # dot cropped out for this config
            centroid = np.array([xs.mean(), ys.mean()])
            assert np.linalg.norm(centroid - mapped) < 2.0, (
                flip, rotate, centroid, mapped)


def test_depth_rasterization_zbuffer():
    pts = np.array([
        [10.0, 5.0, 20.0],
        [10.2, 5.2, 8.0],   # same pixel, closer -> wins
        [3.0, 2.0, 50.0],   # beyond depth bound -> dropped
    ], np.float32)
    dm = T.points_to_depth_map(pts, 16, 32, (2.0, 42.0, 0.5))
    assert dm[5, 10] == 8.0
    assert dm[2, 3] == 0.0


def test_miou_metric_perfect_and_known():
    m = MIoUMetric()
    gt = np.random.RandomState(0).randint(0, 18, size=(200, 200, 16))
    m.add_batch(gt, gt, np.ones_like(gt, bool))
    res = m.count_miou()
    assert res["Overall"] == 100.0
    m2 = MIoUMetric()
    pred = gt.copy()
    pred[gt == 4] = 5  # all cars misclassified
    m2.add_batch(pred, gt, np.ones_like(gt, bool))
    res2 = m2.count_miou()
    assert res2["car"] == 0.0 and res2["Overall"] < 100.0


def test_fscore_matches_kdtree_oracle(rng):
    """FScoreMetric's grid-dilation NN must equal the reference's KDTree
    query (``/root/reference/mmdet3d/datasets/occ_metrics.py:246-276``)."""
    pytest.importorskip("sklearn")
    from sklearn.neighbors import KDTree

    from fbbev_tpu.evaluation.occ_metrics import FScoreMetric

    H, W, Z = 24, 24, 6
    gt = np.full((H, W, Z), 17, np.uint8)
    pred = np.full((H, W, Z), 17, np.uint8)
    gt[(rng.rand(H, W, Z) < 0.1)] = 3
    pred[(rng.rand(H, W, Z) < 0.1)] = 5
    mask = rng.rand(H, W, Z) < 0.8

    # NOTE: thresholds that sit exactly on the voxel lattice (e.g. the 0.4
    # default with 0.4 voxels) are fp-rounding-dependent in the reference's
    # KDTree (|i*0.4 - j*0.4| evaluates to 0.4 +/- 1ulp per location); the
    # grid-dilation form is exact, so parity is asserted off-boundary.
    for thr in (0.3, 0.6, 1.0):
        m = FScoreMetric(threshold_acc=thr, threshold_complete=thr,
                         use_image_mask=True)
        m.add_batch(pred.copy(), gt.copy(), mask)

        # reference formulation: voxel-centre point clouds + KDTree
        def pts(vol):
            g = vol.copy()
            g[~mask] = 255
            occ = ~np.isin(g, (17, 255))
            iy, ix, iz = np.where(occ)
            return np.stack([iy * 0.4, ix * 0.4, iz * 0.4], -1)

        p_gt, p_pred = pts(gt), pts(pred)
        comp = (KDTree(p_pred).query(p_gt)[0].ravel() < thr).mean()
        acc = (KDTree(p_gt).query(p_pred)[0].ravel() < thr).mean()
        f1 = 2.0 / (1 / (acc + 1e-8) + 1 / (comp + 1e-8))
        assert abs(m.tot_acc - acc) < 1e-9, thr
        assert abs(m.tot_cmpl - comp) < 1e-9, thr
        assert abs(m.count_fscore()["f-score"] - round(f1, 4)) <= 1e-4, thr


def test_rt_matrix_cam_modes(rng):
    """CAM / CAM_XYD rt-matrix modes (datasets/utils.py:150-243): round
    trips and the pixel-depth projection identity."""
    from fbbev_tpu.data.transforms import nuscenes_rt_matrix

    def quat(ax, angle):
        ax = np.asarray(ax, float) / np.linalg.norm(ax)
        return np.concatenate([[np.cos(angle / 2)], ax * np.sin(angle / 2)])

    K = np.array([[560.0, 0, 352], [0, 560.0, 128], [0, 0, 1]])
    info = {
        "ego2global_rotation": quat([0, 0, 1], 0.3),
        "ego2global_translation": [10.0, -4.0, 0.1],
        "lidar2ego_rotation": quat([0, 0, 1], -0.05),
        "lidar2ego_translation": [0.9, 0.0, 1.8],
        "cams": {"CAM_FRONT": {
            "sensor2lidar_rotation": np.array(
                [[0, -1, 0], [0, 0, -1], [1, 0, 0]], float).T,
            "sensor2lidar_translation": [1.5, 0.0, 1.5],
            "cam_intrinsic": K,
        }},
    }
    # round trip CAM -> lidar -> CAM == identity
    a = nuscenes_rt_matrix(info, info, "CAM_FRONT", "lidar")
    b = nuscenes_rt_matrix(info, info, "lidar", "CAM_FRONT")
    np.testing.assert_allclose(b @ a, np.eye(4), atol=1e-10)
    # XYD: cam-frame point -> pixel*depth coords must equal K @ xyz
    m = nuscenes_rt_matrix(info, info, "CAM_FRONT", "CAM_FRONT_XYD")
    p = np.array([0.5, -0.2, 12.0, 1.0])
    xyd = m @ p
    expect = K @ p[:3]
    np.testing.assert_allclose(xyd[:3], expect, atol=1e-9)
    # XYD -> global -> XYD round trip
    g = nuscenes_rt_matrix(info, info, "CAM_FRONT_XYD", "global")
    back = nuscenes_rt_matrix(info, info, "global", "CAM_FRONT_XYD")
    np.testing.assert_allclose(back @ g, np.eye(4), atol=1e-9)


def test_prefetch_loader_matches_sync_order():
    """PrefetchLoader must yield byte-identical batches in sampler order
    (the stream-per-slot temporal contract depends on it)."""
    from fbbev_tpu.data.loader import PrefetchLoader

    ds = SyntheticClipDataset(n_scenes=2, frames_per_scene=3,
                              input_size=(16, 48), num_cams=2,
                              occ_shape=(8, 8, 4))
    idx_batches = [[0, 3], [1, 4], [2, 5]]
    from fbbev_tpu.data.synthetic import collate
    sync = [collate([ds[i] for i in idxs]) for idxs in idx_batches]
    pre = list(PrefetchLoader(ds, iter(idx_batches), num_workers=3,
                              prefetch=2))
    assert len(pre) == len(sync)
    for a, b in zip(pre, sync):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_prefetch_loader_propagates_errors():
    from fbbev_tpu.data.loader import PrefetchLoader

    class Boom:
        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    with np.testing.assert_raises(RuntimeError):
        list(PrefetchLoader(Boom(), iter([[0]]), num_workers=2))


class _FakeDetDataset:
    """Minimal dataset exposing the CBGS contract (get_cat_ids + flag)."""

    CLASSES = ("car", "truck", "pedestrian")

    def __init__(self, cat_ids_per_sample):
        self._cats = cat_ids_per_sample
        self.flag = np.arange(len(cat_ids_per_sample), dtype=np.int64) // 2

    def get_cat_ids(self, idx):
        return self._cats[idx]

    def __getitem__(self, idx):
        return {"index": np.int32(idx)}

    def __len__(self):
        return len(self._cats)


def test_cbgs_resampling_matches_reference_formula():
    """CBGSDataset draws int(len(I_c) * (1/K)/p_c) samples per class from
    that class's index list (dataset_wrappers.py:30-62), remaps flag, and
    is deterministic for a fixed seed."""
    from fbbev_tpu.data import CBGSDataset

    # class 0 appears in 6 samples, class 1 in 2, class 2 in 2 -> the
    # rare classes get oversampled toward equal expected share
    cats = [[0], [0], [0], [0], [0], [0, 1], [1], [2], [2, 0], [2]]
    base = _FakeDetDataset(cats)
    ds = CBGSDataset(base, seed=0)

    class_inds = {c: [i for i, cs in enumerate(cats) if c in cs]
                  for c in range(3)}
    dup = sum(len(v) for v in class_inds.values())
    # NOTE reference op order (dataset_wrappers.py:54-59): ratio is
    # computed FIRST (frac / class_distribution) and then multiplied by
    # len -- the float association changes int() truncation.
    expected_counts = {
        c: int(len(v) * ((1.0 / 3) / (len(v) / dup)))
        for c, v in class_inds.items()
    }
    assert len(ds) == sum(expected_counts.values())

    # every resampled index must come from some class list; per-class
    # draw counts are contiguous blocks in reference order
    pos = 0
    for c in range(3):
        block = ds.sample_indices[pos:pos + expected_counts[c]]
        assert set(block) <= set(class_inds[c])
        pos += expected_counts[c]

    # flag remap + delegation
    np.testing.assert_array_equal(
        ds.flag, base.flag[np.asarray(ds.sample_indices)])
    i0 = ds.sample_indices[0]
    assert int(ds[0]["index"]) == i0
    assert ds.get_cat_ids(0) == cats[i0]

    # determinism
    ds2 = CBGSDataset(base, seed=0)
    assert ds2.sample_indices == ds.sample_indices
    ds3 = CBGSDataset(base, seed=1)
    assert ds3.sample_indices != ds.sample_indices


def test_repeat_dataset_wrapper():
    from fbbev_tpu.data import RepeatDataset

    base = _FakeDetDataset([[0], [1], [2]])
    ds = RepeatDataset(base, times=3)
    assert len(ds) == 9
    assert int(ds[4]["index"]) == 1
    assert ds.get_cat_ids(5) == [2]
    np.testing.assert_array_equal(ds.flag, np.tile(base.flag, 3))


def test_nuscenes_get_cat_ids_from_ann_infos():
    """get_cat_ids over bevdetv2-style infos: distinct in-range labels."""
    from fbbev_tpu.data import NuScenesDataset

    ds = NuScenesDataset.__new__(NuScenesDataset)  # skip file IO
    ds.infos = [
        dict(ann_infos=(np.zeros((4, 9)), np.array([0, 0, 3, 9]))),
        dict(ann_infos=(np.zeros((2, 9)), np.array([-1, 23]))),
        dict(gt_names=np.array(["car", "truck", "car", "unknown_thing"]),
             valid_flag=np.array([True, True, False, True])),
    ]
    assert ds.get_cat_ids(0) == [0, 3, 9]
    assert ds.get_cat_ids(1) == []
    assert ds.get_cat_ids(2) == [0, 1]
