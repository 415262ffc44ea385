"""LLFF (real forward-facing / 360) dataset loader.

Capability parity with dataloader/load_llff.py:244-317: poses_bounds.npy 3x5
poses + near/far bounds, factor-N minified image cache, axis reorder,
bd_factor rescale, recenter_poses, spherify for 360 captures, spiral render
path, closest-to-mean holdout view.

Design delta: the reference shells out to ImageMagick ``mogrify`` to build
the ``images_{N}/`` cache (load_llff.py:8-57); we minify in-process with
cv2.INTER_AREA (no external binary), writing the same cache layout so
existing caches are reused either way.
"""

from __future__ import annotations

import os
from typing import Optional

import imageio.v2 as imageio
import numpy as np

from swnerf_tpu.data.cameras import (
    poses_avg,
    recenter_poses,
    render_path_spiral,
    normalize,
    spherify_poses,
)

_IMG_EXTS = ("JPG", "jpg", "png", "jpeg", "PNG")


def _list_images(d: str):
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if any(f.endswith(ex) for ex in _IMG_EXTS)
    ]


def _minify(basedir: str, factor: int) -> str:
    """Build (or reuse) the images_{factor}/ cache with cv2 area resize."""
    imgdir = os.path.join(basedir, f"images_{factor}")
    if os.path.exists(imgdir):
        return imgdir
    import cv2

    os.makedirs(imgdir)
    for src in _list_images(os.path.join(basedir, "images")):
        img = imageio.imread(src)
        H, W = img.shape[:2]
        out = cv2.resize(img, (W // factor, H // factor), interpolation=cv2.INTER_AREA)
        name = os.path.splitext(os.path.basename(src))[0] + ".png"
        imageio.imwrite(os.path.join(imgdir, name), out)
    return imgdir


def _load_data(basedir: str, factor: Optional[int] = None):
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
    bds = poses_arr[:, -2:].transpose([1, 0])

    if factor is not None and factor != 1:
        imgdir = _minify(basedir, factor)
    else:
        factor = 1
        imgdir = os.path.join(basedir, "images")

    imgfiles = _list_images(imgdir)
    if poses.shape[-1] != len(imgfiles):
        raise ValueError(
            f"Mismatch between imgs {len(imgfiles)} and poses {poses.shape[-1]}"
        )

    sh = imageio.imread(imgfiles[0]).shape
    poses[:2, 4, :] = np.array(sh[:2]).reshape([2, 1])
    poses[2, 4, :] = poses[2, 4, :] * 1.0 / factor

    imgs = np.stack([imageio.imread(f)[..., :3] / 255.0 for f in imgfiles], -1)
    return poses, bds, imgs


def load_llff_data(
    basedir: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: Optional[float] = 0.75,
    spherify: bool = False,
    path_zflat: bool = False,
):
    """Returns (images, poses[.., 3,5 with hwf col], bds, render_poses,
    i_test)."""
    poses, bds, imgs = _load_data(basedir, factor=factor)

    # Column reorder [down, right, back] -> [right, up, back] and move the
    # image axis to the front.
    poses = np.concatenate([poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    images = np.moveaxis(imgs, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)

    sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
    poses[:, :3, 3] *= sc
    bds = bds * sc

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bds = spherify_poses(poses, bds)
    else:
        c2w = poses_avg(poses)
        up = normalize(poses[:, :3, 1].sum(0))

        close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
        dt = 0.75
        focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)

        tt = poses[:, :3, 3]
        rads = np.percentile(np.abs(tt), 90, 0)
        c2w_path = c2w
        n_views, n_rots = 120, 2
        if path_zflat:
            zloc = -close_depth * 0.1
            c2w_path[:3, 3] = c2w_path[:3, 3] + zloc * c2w_path[:3, 2]
            rads[2] = 0.0
            n_rots, n_views = 1, n_views // 2
        render_poses = render_path_spiral(
            c2w_path, up, rads, focal, zrate=0.5, rots=n_rots, n=n_views
        )

    render_poses = np.array(render_poses).astype(np.float32)

    c2w = poses_avg(poses)
    dists = np.sum(np.square(c2w[:3, 3] - poses[:, :3, 3]), -1)
    i_test = int(np.argmin(dists))

    return images.astype(np.float32), poses.astype(np.float32), bds, render_poses, i_test
