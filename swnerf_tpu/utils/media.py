"""Image/video output: PNG dumps and spiral videos.

Parity with the reference's imageio usage (run.py:210-213 PNG frames,
run.py:574,732-733 ``*_rgb.mp4``/``*_disp.mp4``). This image has no
imageio-ffmpeg backend, so videos are encoded with cv2.VideoWriter (mp4v),
falling back to an animated GIF if that is unavailable.
"""

from __future__ import annotations

import os
import numpy as np

from swnerf_tpu.utils.metrics import to8b


def write_png(path: str, img01: np.ndarray) -> None:
    from swnerf_tpu.parallel.multihost import is_primary

    if not is_primary():  # multi-process: renders run everywhere, files on p0
        return
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, to8b(img01))


def write_video(path: str, frames01: np.ndarray, fps: int = 30) -> str:
    """Write [T,H,W,3] (or [T,H,W]) floats in [0,1] to mp4 (or gif fallback).
    Returns the path actually written (process 0 only, see write_png)."""
    from swnerf_tpu.parallel.multihost import is_primary

    if not is_primary():
        return path
    frames = to8b(np.asarray(frames01))
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, axis=-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import cv2

        H, W = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        return path
    except Exception:
        import imageio.v2 as imageio

        gif_path = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif_path, frames, duration=1.0 / fps)
        return gif_path
