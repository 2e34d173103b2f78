"""Generate a miniature on-disk nuScenes-like dataset (real file formats:
JPEG cameras, float32 LiDAR .bin, Occ3D labels.npz, bevdetv2 info pickle)
so the real-data pipeline (``fbbev_tpu/data/nuscenes.py``) is exercised in
CI without the actual nuScenes files.

Schema parity: ``tools/create_data.py`` /
``/root/reference/tools/create_data_bevdet.py`` info dicts;
``/root/reference/mmdet3d/datasets/pipelines/loading.py:147-229`` occupancy
files (semantics + mask_camera + mask_lidar).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _quat_z(angle: float):
    """[w, x, y, z] quaternion for a rotation about +z."""
    return [float(np.cos(angle / 2)), 0.0, 0.0, float(np.sin(angle / 2))]


def write_fake_nuscenes(root: str, n_scenes: int = 2,
                        frames_per_scene: int = 4,
                        img_hw=(90, 160), occ_shape=(50, 50, 16),
                        cam_names=("CAM_FRONT", "CAM_BACK"),
                        seed: int = 0) -> dict:
    """Returns dict(ann_file=..., occupancy_path=..., cam_names=...)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    H0, W0 = img_hw
    img_dir = os.path.join(root, "samples")
    occ_dir = os.path.join(root, "gts")
    lidar_dir = os.path.join(root, "sweeps")
    for d in (img_dir, occ_dir, lidar_dir):
        os.makedirs(d, exist_ok=True)

    K = np.array([[120.0, 0, W0 / 2], [0, 120.0, H0 / 2], [0, 0, 1]])
    # camera mounted looking forward (x right, y down, z forward),
    # cam->lidar axes permutation
    cam2lidar_rot = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)

    infos = []
    for s in range(n_scenes):
        scene_name = f"scene-{s:04d}"
        heading = rng.uniform(0, 2 * np.pi)
        pos = rng.uniform(-20, 20, size=2)
        for t in range(frames_per_scene):
            token = f"tok_{s}_{t}"
            # ego drives forward with slight yaw drift
            heading += rng.uniform(-0.05, 0.05)
            pos = pos + 2.0 * np.array([np.cos(heading), np.sin(heading)])
            ego_rot = _quat_z(heading)
            ego_tr = [float(pos[0]), float(pos[1]), 0.0]

            cams = {}
            for ci, cam_name in enumerate(cam_names):
                fn = os.path.join(img_dir, f"{token}_{cam_name}.jpg")
                arr = rng.randint(0, 255, (H0, W0, 3), np.uint8)
                Image.fromarray(arr).save(fn, quality=90)
                yaw = 0.0 if "FRONT" in cam_name else np.pi
                rot_z = np.array([
                    [np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
                s2l_rot = rot_z @ cam2lidar_rot
                # sensor2ego == sensor2lidar composed with lidar2ego below
                lidar2ego_rot = np.eye(3)
                s2e_rot = lidar2ego_rot @ s2l_rot
                w = np.sqrt(max(0.0, 1 + np.trace(s2e_rot))) / 2
                q = [w,
                     (s2e_rot[2, 1] - s2e_rot[1, 2]) / (4 * w + 1e-12),
                     (s2e_rot[0, 2] - s2e_rot[2, 0]) / (4 * w + 1e-12),
                     (s2e_rot[1, 0] - s2e_rot[0, 1]) / (4 * w + 1e-12)]
                cams[cam_name] = dict(
                    data_path=fn,
                    cam_intrinsic=K.copy(),
                    sensor2ego_rotation=[float(x) for x in q],
                    sensor2ego_translation=[1.5 if ci == 0 else -1.5, 0.0,
                                            1.6],
                    sensor2lidar_rotation=s2l_rot,
                    sensor2lidar_translation=[1.5 if ci == 0 else -1.5,
                                              0.0, -0.2],
                    ego2global_rotation=ego_rot,
                    ego2global_translation=ego_tr,
                )

            lidar_path = os.path.join(lidar_dir, f"{token}.bin")
            pts = rng.uniform(-1, 1, (512, 5)).astype(np.float32)
            pts[:, 0] = rng.uniform(2, 40, 512)          # forward
            pts[:, 1] = rng.uniform(-10, 10, 512)
            pts[:, 2] = rng.uniform(-1.5, 2.0, 512)
            pts.tofile(lidar_path)

            occ_sample_dir = os.path.join(occ_dir, scene_name, token)
            os.makedirs(occ_sample_dir, exist_ok=True)
            sem = np.full(occ_shape, 17, np.uint8)  # free (raw Occ3D label)
            blobs = rng.randint(0, 16, 5)
            for b in blobs:
                x, y = rng.randint(5, occ_shape[0] - 5), rng.randint(
                    5, occ_shape[1] - 5)
                sem[x - 2:x + 2, y - 2:y + 2, 2:6] = b
            mask_cam = rng.rand(*occ_shape) < 0.85
            np.savez(os.path.join(occ_sample_dir, "labels.npz"),
                     semantics=sem, mask_camera=mask_cam,
                     mask_lidar=np.ones(occ_shape, bool))

            # fixed-size padded GT (labels -1 = padding), matching the
            # framework's static-shape batch contract
            M = 6
            n_box = rng.randint(1, 4)
            boxes = np.zeros((M, 9), np.float32)
            labels = np.full((M,), -1, np.int64)
            boxes[:n_box, :2] = rng.uniform(-30, 30, (n_box, 2))
            boxes[:n_box, 2] = 0.5
            boxes[:n_box, 3:6] = [4.0, 2.0, 1.6]
            boxes[:n_box, 6] = rng.uniform(-np.pi, np.pi, n_box)
            labels[:n_box] = rng.randint(0, 10, n_box)

            infos.append(dict(
                token=token,
                scene_name=scene_name,
                prev=[] if t == 0 else [f"tok_{s}_{t-1}"],
                timestamp=t,
                lidar_path=lidar_path,
                lidar2ego_rotation=_quat_z(0.0),
                lidar2ego_translation=[0.9, 0.0, 1.8],
                ego2global_rotation=ego_rot,
                ego2global_translation=ego_tr,
                cams=cams,
                ann_infos=(boxes, labels),
            ))

    ann_file = os.path.join(root, "bevdetv2-nuscenes_infos_val.pkl")
    with open(ann_file, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version="fake")), f)
    return dict(ann_file=ann_file, occupancy_path=occ_dir,
                cam_names=list(cam_names))
