"""Blender synthetic dataset loaders (static + dynamic/D-NeRF variants).

Capability parity:
  * static — dataloader/load_blender.py:82-150: transforms_{split}.json (or
    auto 80/10/10 split of a single transforms.json), RGBA /255, focal from
    camera_angle_x, 360-pose spherical render path, half_res INTER_AREA
    downscale, testskip stride on val/test.
  * dynamic — dataloader/load_blender_dnerf.py:75-151: per-frame ``time``
    (default linspace over the split), t must start at 0, optional
    transforms_render.json path else a 40-pose orbit, render_times
    linspace(0,1).

Torch-free, one shared implementation for both variants. Reference quirk
fixed (recorded in SURVEY.md §7): load_blender_dnerf.py:146 passes (H, W)
into cv2.resize's (w, h) slot — correct only for square images; we always
pass (W, H).
"""

from __future__ import annotations

import json
import os
import imageio.v2 as imageio
import numpy as np

from swnerf_tpu.data.cameras import spherical_orbit

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _resize_area(img: np.ndarray, W: int, H: int) -> np.ndarray:
    if cv2 is not None:
        return cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
    # Fallback: 2x2 box average (half_res is the only use in-repo).
    assert img.shape[0] == 2 * H and img.shape[1] == 2 * W
    return img.reshape(H, 2, W, 2, -1).mean((1, 3))


def _read_split_metas(basedir: str):
    metas = {}
    for s in ("train", "val", "test"):
        path = os.path.join(basedir, f"transforms_{s}.json")
        if os.path.exists(path):
            with open(path) as fp:
                metas[s] = json.load(fp)
        else:
            metas[s] = None
    if all(m is None for m in metas.values()):
        # Single-file capture: auto 80/10/10 split (load_blender.py:92-103).
        with open(os.path.join(basedir, "transforms.json")) as fp:
            meta = json.load(fp)
        frames = meta["frames"]
        n = len(frames)
        a, b = int(0.8 * n), int(0.9 * n)
        shared = {k: v for k, v in meta.items() if k != "frames"}
        metas = {
            "train": {**shared, "frames": frames[:a]},
            "val": {**shared, "frames": frames[a:b]},
            "test": {**shared, "frames": frames[b:]},
        }
    return metas


def _load_frames(basedir: str, frames, with_time: bool):
    imgs, poses, times = [], [], []
    for t, frame in enumerate(frames):
        fname = os.path.join(basedir, frame["file_path"] + ".png")
        imgs.append(imageio.imread(fname))
        poses.append(np.array(frame["transform_matrix"]))
        if with_time:
            denom = max(len(frames) - 1, 1)
            times.append(frame.get("time", float(t) / denom))
    imgs = (np.array(imgs) / 255.0).astype(np.float32)
    poses = np.array(poses).astype(np.float32)
    times = np.array(times, dtype=np.float32) if with_time else None
    return imgs, poses, times


def _half_res(imgs: np.ndarray, H: int, W: int, focal: float):
    H, W, focal = H // 2, W // 2, focal / 2.0
    out = np.zeros((imgs.shape[0], H, W, imgs.shape[-1]), dtype=np.float32)
    for i, img in enumerate(imgs):
        out[i] = _resize_area(img, W, H)
    return out, H, W, focal


def load_blender_data(basedir: str, half_res: bool = False, testskip: int = 1):
    """Static variant. Returns (imgs[RGBA], poses, render_poses, [H,W,focal],
    i_split)."""
    metas = _read_split_metas(basedir)
    all_imgs, all_poses, counts = [], [], [0]
    meta = None
    for s in ("train", "val", "test"):
        meta = metas[s]
        skip = 1 if (s == "train" or testskip == 0) else testskip
        imgs, poses, _ = _load_frames(basedir, meta["frames"][::skip], with_time=False)
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_poses = spherical_orbit(360)

    if half_res:
        imgs, H, W, focal = _half_res(imgs, H, W, focal)

    return imgs, poses, render_poses, [H, W, focal], i_split


def load_blender_dynamic_data(basedir: str, half_res: bool = False, testskip: int = 1):
    """D-NeRF variant. Returns (imgs, poses, times, render_poses,
    render_times, [H,W,focal], i_split)."""
    metas = _read_split_metas(basedir)
    all_imgs, all_poses, all_times, counts = [], [], [], [0]
    meta = None
    for s in ("train", "val", "test"):
        meta = metas[s]
        imgs, poses, times = _load_frames(
            basedir, meta["frames"][::testskip], with_time=True
        )
        assert times[0] == 0, "Time must start at 0"
        counts.append(counts[-1] + imgs.shape[0])
        all_imgs.append(imgs)
        all_poses.append(poses)
        all_times.append(times)

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    times = np.concatenate(all_times, 0)

    H, W = imgs[0].shape[:2]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    render_path = os.path.join(basedir, "transforms_render.json")
    if os.path.exists(render_path):
        with open(render_path) as fp:
            rmeta = json.load(fp)
        render_poses = np.array(
            [np.array(f["transform_matrix"]) for f in rmeta["frames"]], dtype=np.float32
        )
    else:
        render_poses = spherical_orbit(40)
    render_times = np.linspace(0.0, 1.0, render_poses.shape[0]).astype(np.float32)

    if half_res:
        imgs, H, W, focal = _half_res(imgs, H, W, focal)

    return imgs, poses, times, render_poses, render_times, [H, W, focal], i_split
