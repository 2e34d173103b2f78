#!/usr/bin/env python
"""Offline nuScenes -> bevdetv2 info-pickle converter.

Port of ``/root/reference/tools/create_data_bevdet.py`` (:43-195): walks the
nuScenes DB with the official devkit, writes
``bevdetv2-nuscenes_infos_{train,val}.pkl`` with per-sample camera
calibration, ego poses, ego-frame GT boxes (``ann_infos``) and scene names,
sorted by scene/timestamp so sequence grouping works.

Requires the ``nuscenes-devkit`` package and raw data on disk; both are
optional for the rest of the framework (the pickles are the interface).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CLASS_MAP = {
    "vehicle.car": "car",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
}
CLASSES = ["car", "truck", "construction_vehicle", "bus", "trailer",
           "barrier", "motorcycle", "bicycle", "pedestrian", "traffic_cone"]


def get_gt(nusc, sample):
    """Ego-frame GT boxes [x,y,z,dx,dy,dz,yaw,vx,vy] + labels + annotated
    attribute names (cf. create_data_bevdet.py:43-85; attributes feed the
    mAAE term of the self-contained NDS evaluation -- the reference gets
    them implicitly from the devkit DB at eval time)."""
    from pyquaternion import Quaternion

    sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    ego_pose = nusc.get("ego_pose", sd["ego_pose_token"])
    ego2global = Quaternion(ego_pose["rotation"]).inverse
    boxes, labels, attrs = [], [], []
    for ann_token in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_token)
        name = CLASS_MAP.get(ann["category_name"])
        if name is None:
            continue
        box = nusc.get_box(ann_token)
        box.translate(-np.array(ego_pose["translation"]))
        box.rotate(ego2global)
        vel = nusc.box_velocity(ann_token)[:2]
        vel = ego2global.rotation_matrix[:2, :2] @ np.nan_to_num(vel)
        yaw = box.orientation.yaw_pitch_roll[0]
        boxes.append(np.concatenate([
            box.center, box.wlh[[1, 0, 2]], [yaw], vel]))
        labels.append(CLASSES.index(name))
        attrs.append(
            nusc.get("attribute", ann["attribute_tokens"][0])["name"]
            if ann["attribute_tokens"] else "")
    if boxes:
        return (np.stack(boxes).astype(np.float32), np.asarray(labels),
                attrs)
    return np.zeros((0, 9), np.float32), np.zeros((0,), np.int64), []


def convert(data_root: str, version: str, out_dir: str):
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=version, dataroot=data_root, verbose=True)
    if "mini" in version:
        split_scenes = dict(train=splits.mini_train, val=splits.mini_val)
    else:
        split_scenes = dict(train=splits.train, val=splits.val)

    samples_by_scene = {}
    for sample in nusc.sample:
        scene = nusc.get("scene", sample["scene_token"])
        samples_by_scene.setdefault(scene["name"], []).append(sample)
    for k in samples_by_scene:
        samples_by_scene[k].sort(key=lambda s: s["timestamp"])

    for split, scene_names in split_scenes.items():
        infos = []
        for scene_name in scene_names:
            if scene_name not in samples_by_scene:
                continue
            for sample in samples_by_scene[scene_name]:
                lidar_sd = nusc.get("sample_data",
                                    sample["data"]["LIDAR_TOP"])
                cs = nusc.get("calibrated_sensor",
                              lidar_sd["calibrated_sensor_token"])
                pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
                cams = {}
                for cam_name in ("CAM_FRONT_LEFT", "CAM_FRONT",
                                 "CAM_FRONT_RIGHT", "CAM_BACK_LEFT",
                                 "CAM_BACK", "CAM_BACK_RIGHT"):
                    cam_sd = nusc.get("sample_data",
                                      sample["data"][cam_name])
                    cam_cs = nusc.get(
                        "calibrated_sensor",
                        cam_sd["calibrated_sensor_token"])
                    cam_pose = nusc.get("ego_pose",
                                        cam_sd["ego_pose_token"])
                    cams[cam_name] = dict(
                        data_path=os.path.join(data_root,
                                               cam_sd["filename"]),
                        cam_intrinsic=np.asarray(
                            cam_cs["camera_intrinsic"], np.float64),
                        sensor2ego_rotation=cam_cs["rotation"],
                        sensor2ego_translation=cam_cs["translation"],
                        ego2global_rotation=cam_pose["rotation"],
                        ego2global_translation=cam_pose["translation"],
                    )
                infos.append(dict(
                    token=sample["token"],
                    scene_name=scene_name,
                    prev=sample["prev"],
                    timestamp=sample["timestamp"],
                    lidar_path=os.path.join(data_root,
                                            lidar_sd["filename"]),
                    lidar2ego_rotation=cs["rotation"],
                    lidar2ego_translation=cs["translation"],
                    ego2global_rotation=pose["rotation"],
                    ego2global_translation=pose["translation"],
                    cams=cams,
                    ann_infos=get_gt(nusc, sample),
                ))
        out = os.path.join(out_dir,
                           f"bevdetv2-nuscenes_infos_{split}.pkl")
        with open(out, "wb") as f:
            pickle.dump(dict(infos=infos,
                             metadata=dict(version=version)), f)
        print(f"{split}: {len(infos)} samples -> {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()
    try:
        import nuscenes  # noqa: F401
    except ImportError:
        sys.exit("nuscenes-devkit is required for data conversion: "
                 "pip install nuscenes-devkit (the rest of fbbev_tpu does "
                 "not need it; the output pickles are the interface)")
    convert(args.data_root, args.version, args.out_dir or args.data_root)


if __name__ == "__main__":
    main()
