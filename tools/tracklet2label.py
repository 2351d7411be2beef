#!/usr/bin/env python
"""KITTI-raw tracklet XML -> per-frame gt 3D corner labels (.npy).

Capability parity with the reference tools/tracklet2label.py, which
depends on an external pykitti/didi parser (:13-14); this version parses
the tracklet_labels.xml format directly with xml.etree (self-contained).

Each output frame file holds (N, 24) lidar-frame corner boxes
(x0..x7, y0..y7, z0..z7) like obj_to_gt_boxes3d (:71-88).
"""

import argparse
import os
import os.path as osp
import sys
import xml.etree.ElementTree as ET

import _init_paths  # noqa: F401
import numpy as np


def parse_tracklets(xml_path):
    """Parse tracklet_labels.xml -> list of dicts with per-frame poses."""
    root = ET.parse(xml_path).getroot()
    tracklets = []
    for item in root.find("tracklets").findall("item"):
        t = {
            "objectType": item.findtext("objectType"),
            "h": float(item.findtext("h")),
            "w": float(item.findtext("w")),
            "l": float(item.findtext("l")),
            "first_frame": int(item.findtext("first_frame")),
            "poses": [],
        }
        for pose in item.find("poses").findall("item"):
            t["poses"].append({
                "tx": float(pose.findtext("tx")),
                "ty": float(pose.findtext("ty")),
                "tz": float(pose.findtext("tz")),
                "rz": float(pose.findtext("rz")),
            })
        tracklets.append(t)
    return tracklets


def box_to_corners(tx, ty, tz, l, w, h, rz):
    """Lidar-frame yaw-rotated 24-corner box (tracklet poses are in the
    velodyne frame with the box origin at the bottom center)."""
    x_c = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * (l / 2.0)
    y_c = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * (w / 2.0)
    z_c = np.array([0, 0, 0, 0, 1, 1, 1, 1]) * h
    c, s = np.cos(rz), np.sin(rz)
    xr = c * x_c - s * y_c + tx
    yr = s * x_c + c * y_c + ty
    zr = z_c + tz
    return np.concatenate([xr, yr, zr]).astype(np.float32)


def main():
    p = argparse.ArgumentParser(description="tracklet XML -> gt corner npy")
    p.add_argument("--xml", required=True, help="tracklet_labels.xml")
    p.add_argument("--out", required=True, help="output dir for <frame>.npy")
    p.add_argument("--type", default="Car",
                   help="object type filter (Car default)")
    args = p.parse_args()

    tracklets = parse_tracklets(args.xml)
    frames = {}
    for t in tracklets:
        if args.type and t["objectType"] != args.type:
            continue
        for k, pose in enumerate(t["poses"]):
            fr = t["first_frame"] + k
            frames.setdefault(fr, []).append(
                box_to_corners(pose["tx"], pose["ty"], pose["tz"],
                               t["l"], t["w"], t["h"], pose["rz"]))
    os.makedirs(args.out, exist_ok=True)
    for fr, boxes in sorted(frames.items()):
        np.save(osp.join(args.out, str(fr).zfill(10) + ".npy"),
                np.stack(boxes))
    print("wrote {} frames ({} boxes) to {}".format(
        len(frames), sum(len(b) for b in frames.values()), args.out))


if __name__ == "__main__":
    main()
