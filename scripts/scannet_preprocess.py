#!/usr/bin/env python3
"""Preprocess extracted ScanNet scans into the layout the ScanNet reader
expects (reference scripts/scannet_preprocess.py, PIL/numpy instead of cv2):

  input:  <scan>/color/*.jpg, <scan>/depth/*.png (u16 mm), <scan>/pose/*.txt
  output: <out>/rgb/%d.png (resized to depth resolution),
          <out>/depth/%d.TIFF (float32 meters),
          <out>/gt_pose.txt (TUM format: t tx ty tz qx qy qz qw, fake 20 fps),
          skipping frames whose pose contains inf (reference behavior).
"""
import argparse
import os
from glob import glob

import numpy as np
from PIL import Image


def rotmat_to_quat_xyzw(R):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w, x, y, z = 0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w, x, y, z = (R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w, x, y, z = (R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s, (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w, x, y, z = (R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s, (R[1, 2] + R[2, 1]) / s, 0.25 * s
    return x, y, z, w


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="extracted scan dir")
    p.add_argument("--output", required=True)
    p.add_argument("--depth_scale", type=float, default=1000.0)
    args = p.parse_args()

    os.makedirs(os.path.join(args.output, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(args.output, "depth"), exist_ok=True)
    colors = sorted(glob(os.path.join(args.input, "color", "*.jpg")),
                    key=lambda s: int(os.path.basename(s).split(".")[0]))
    lines = []
    kept = 0
    for cp in colors:
        fid = int(os.path.basename(cp).split(".")[0])
        pose_path = os.path.join(args.input, "pose", f"{fid}.txt")
        depth_path = os.path.join(args.input, "depth", f"{fid}.png")
        if not (os.path.exists(pose_path) and os.path.exists(depth_path)):
            continue
        pose = np.loadtxt(pose_path)
        if not np.all(np.isfinite(pose)):
            continue  # reference drops inf poses
        depth = np.asarray(Image.open(depth_path)).astype(np.float32)
        depth /= args.depth_scale
        h, w = depth.shape
        rgb = Image.open(cp).convert("RGB").resize((w, h), Image.BILINEAR)
        rgb.save(os.path.join(args.output, "rgb", f"{kept}.png"))
        Image.fromarray(depth, mode="F").save(
            os.path.join(args.output, "depth", f"{kept}.TIFF")
        )
        t = kept / 20.0  # fake 20 fps timestamps (reference behavior)
        qx, qy, qz, qw = rotmat_to_quat_xyzw(pose[:3, :3])
        tx, ty, tz = pose[:3, 3]
        lines.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
                     f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
        kept += 1
    with open(os.path.join(args.output, "gt_pose.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"kept {kept}/{len(colors)} frames -> {args.output}")


if __name__ == "__main__":
    main()
