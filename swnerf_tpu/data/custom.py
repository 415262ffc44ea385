"""Custom ("SW" capture) dataset loader.

Capability parity with dataloader/load_custom_data.py:86-161: single
transforms.json with full fl_x/fl_y/cx/cy intrinsics -> 3x3 K, random
80/10/10 frame split, RGB->RGBA alpha pad, half_res rescale of both images
and intrinsics, z-up spherical render orbit.

Reference quirk fixed (recorded in SURVEY.md §7): the reference's
random.shuffle is unseeded (load_custom_data.py:94), making splits
non-reproducible across runs; we seed it (``seed`` arg, default 0).
"""

from __future__ import annotations

import json
import os
import random

import imageio.v2 as imageio
import numpy as np

from swnerf_tpu.data.cameras import spherical_orbit


def load_custom_data(basedir: str, half_res: bool = False, testskip: int = 1, seed: int = 0):
    with open(os.path.join(basedir, "transforms.json")) as fp:
        meta = json.load(fp)

    frames = list(meta["frames"])
    random.Random(seed).shuffle(frames)

    n = len(frames)
    a = int(0.8 * n)
    b = a + int(0.1 * n)
    splits = {"train": frames[:a], "val": frames[a:b], "test": frames[b:]}

    all_imgs, all_poses, counts = [], [], [0]
    for s in ("train", "val", "test"):
        skip = testskip if s == "test" else 1
        imgs, poses = [], []
        for frame in splits[s][::skip]:
            img = imageio.imread(os.path.join(basedir, frame["file_path"]))
            if img.shape[-1] == 3:
                alpha = np.full((*img.shape[:2], 1), 255, dtype=img.dtype)
                img = np.concatenate([img, alpha], axis=-1)
            imgs.append(img)
            poses.append(np.array(frame["transform_matrix"]))
        imgs = (np.array(imgs) / 255.0).astype(np.float32)
        poses = np.array(poses).astype(np.float32)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    fl_x, fl_y = meta["fl_x"], meta["fl_y"]
    cx, cy = meta["cx"], meta["cy"]

    if half_res:
        import cv2

        H, W = H // 2, W // 2
        fl_x, fl_y, cx, cy = fl_x / 2.0, fl_y / 2.0, cx / 2.0, cy / 2.0
        out = np.zeros((imgs.shape[0], H, W, 4), dtype=np.float32)
        for i, img in enumerate(imgs):
            out[i] = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        imgs = out

    K = np.array([[fl_x, 0, cx], [0, fl_y, cy], [0, 0, 1]])
    render_poses = spherical_orbit(360, z_up=True)
    return imgs, poses, render_poses, K, [H, W, (fl_x + fl_y) * 0.5], i_split
