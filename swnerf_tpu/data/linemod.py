"""LINEMOD dataset loader.

Capability parity with dataloader/load_LINEMOD.py:37-93: per-split
transforms jsons with absolute file paths, K from the first frame's
``intrinsic_matrix``, near/far = floor/ceil over split metadata, 40-pose
orbit render path, half_res downscale (drops alpha, 3-channel — matching the
reference's (N,H,W,3) buffer at load_LINEMOD.py:85).
"""

from __future__ import annotations

import json
import os

import imageio.v2 as imageio
import numpy as np

from swnerf_tpu.data.cameras import spherical_orbit


def load_linemod_data(basedir: str, half_res: bool = False, testskip: int = 1):
    metas = {}
    for s in ("train", "val", "test"):
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in ("train", "val", "test"):
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            imgs.append(imageio.imread(frame["file_path"]))
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
    K = metas["test"]["frames"][0]["intrinsic_matrix"]
    focal = float(K[0][0])

    render_poses = spherical_orbit(40)

    if half_res:
        import cv2

        H, W, focal = H // 2, W // 2, focal / 2.0
        out = np.zeros((imgs.shape[0], H, W, 3), dtype=np.float32)
        for i, img in enumerate(imgs):
            out[i] = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        imgs = out

    near = float(np.floor(min(metas["train"]["near"], metas["test"]["near"])))
    far = float(np.ceil(max(metas["train"]["far"], metas["test"]["far"])))
    return imgs, poses, render_poses, [H, W, focal], K, i_split, near, far
