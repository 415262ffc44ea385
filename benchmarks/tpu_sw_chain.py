"""One recorded end-to-end SW ("scale-aware") chain at reference scale.

The reference's novelty workflow (README.md:32-53): train a NeRF on a
capture, `extract_mesh --resolution 128 --threshold T` -> mesh.obj, then
`transform_mesh --real_length L` (ArUco metric-scale solve on the
images_ori/ twins) -> transformed_mesh.obj. Each piece is proven in-suite
(tests/test_mesh_pipeline.py) and the res=128 x 100-viewdir sweep is timed
on-chip (benchmarks/tpu_mesh_sweep.py); this script chains them once
through the real CLIs at the drill recipe's resolution and records wall
clock, mesh stats, and the recovered metric scale.

Ground truth: the capture is the analytic textured scene (checker sphere
r=0.8 + striped box + occluder, data/synthetic.py:34-88) and the ArUco
marker is a 0.5-world-unit square warped into every frame's images_ori/
twin at the capture's own camera poses — so `--real_length 0.05` must
recover scale = 0.05/0.5 = 0.1 (measured 1.0% solve error from ArUco
corner localization at this image scale; see VALIDATION.md).

Stages (env: SW_ITERS train iters, default 5000; SW_RES, default 128):
  1. write capture (blender-format train views + transforms.json +
     images_ori/ marker twins)         [host]
  2. run_nerf CLI train                 [TPU]
  3. extract_mesh CLI (res 128, 100 viewdirs)  [TPU sweep + host marching]
  4. transform_mesh CLI                 [host, OpenCV+scipy]
Writes /tmp/sw_chain/result_sw_chain.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.environ.get("SW_OUT", "/tmp/sw_chain")
ITERS = int(os.environ.get("SW_ITERS", "5000"))
RES = int(os.environ.get("SW_RES", "128"))
SIZE = int(os.environ.get("SW_SIZE", "400"))
MARKER_EDGE = 0.5  # world units (~70 px span at the capture distance —
# below ~30 px, ArUco corner quantization biases edge lengths by several %)
REAL_LENGTH = 0.05  # "the physical marker is 5 cm"


def write_marker_twins(data, poses, H, W, focal):
    """images_ori/ twins: the capture frames with a DICT_4X4_1000 ArUco
    marker of world edge 0.2 on the z=0 plane, projected per-pose
    (reference workflow: transform_mesh.py:248-269 detects on images_ori/).
    Blender c2w poses are OpenGL-convention (-z forward); transforms.json
    follows the custom-capture schema (fl_x/fl_y/cx/cy) interpreted with
    pose_convention='c2w' (+z forward), so convert with diag(1,-1,-1)."""
    import cv2

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_1000)
    msize = 240
    marker = cv2.aruco.generateImageMarker(d, 7, msize)
    # Marker world square (edge 0.2, z=0 plane, centered under the scene):
    # bitmap y grows down <-> world y decreases (tests/test_mesh_pipeline.py).
    e = MARKER_EDGE
    world = np.array([[-e / 2, e / 2, 0.0], [e / 2, e / 2, 0.0],
                      [e / 2, -e / 2, 0.0], [-e / 2, -e / 2, 0.0]])
    src_px = np.array([[0, 0], [msize - 1, 0], [msize - 1, msize - 1],
                       [0, msize - 1]], np.float32)
    flip = np.diag([1.0, -1.0, -1.0])
    cx, cy = W / 2.0, H / 2.0

    os.makedirs(os.path.join(data, "images_ori"), exist_ok=True)
    frames = []
    kept = 0
    for k, c2w_gl in enumerate(poses):
        R = c2w_gl[:3, :3] @ flip  # OpenGL -> +z-forward (OpenCV)
        t = c2w_gl[:3, 3]
        c2w = np.eye(4)
        c2w[:3, :3], c2w[:3, 3] = R, t

        def project(p):
            cam = R.T @ (p - t)
            if cam[2] <= 1e-6:
                return None
            return np.array([focal * cam[0] / cam[2] + cx,
                             focal * cam[1] / cam[2] + cy])

        dst = [project(p) for p in world]
        if any(p is None for p in dst):
            continue
        dst = np.stack(dst).astype(np.float32)
        if dst.min() < 8 or dst[:, 0].max() > W - 8 or dst[:, 1].max() > H - 8:
            continue  # marker partially out of frame: skip (real captures too)
        Hm, _ = cv2.findHomography(src_px, dst)
        canvas = cv2.warpPerspective(
            marker, Hm, (W, H), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=255)
        cv2.imwrite(os.path.join(data, "images_ori", f"f{k}.png"), canvas)
        frames.append({"file_path": f"images/f{k}.png",
                       "transform_matrix": c2w.tolist()})
        kept += 1

    meta = {"fl_x": focal, "fl_y": focal, "cx": cx, "cy": cy,
            "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0, "frames": frames}
    with open(os.path.join(data, "transforms.json"), "w") as f:
        json.dump(meta, f)
    print(f"marker twins: {kept}/{len(poses)} frames usable", flush=True)
    return kept


def main():
    os.makedirs(OUT, exist_ok=True)
    data = os.path.join(OUT, f"capture_{SIZE}")
    result = {"iters": ITERS, "resolution": RES, "size": SIZE}

    if not os.path.isdir(data):
        from swnerf_tpu.data.synthetic import write_blender_scene

        t0 = time.time()
        write_blender_scene(data, n_train=35, n_val=2, n_test=5, size=SIZE,
                            dynamic=False, scene="textured", white_bkgd=True)
        print(f"capture written ({time.time() - t0:.1f}s)", flush=True)

    # Marker twins at the capture's own train poses.
    with open(os.path.join(data, "transforms_train.json")) as f:
        tr = json.load(f)
    import math

    poses = [np.array(fr["transform_matrix"]) for fr in tr["frames"]]
    focal = 0.5 * SIZE / math.tan(0.5 * tr["camera_angle_x"])
    result["marker_frames"] = write_marker_twins(data, poses, SIZE, SIZE, focal)

    exp, basedir = "sw_chain", os.path.join(OUT, "logs")
    cfgp = os.path.join(OUT, "sw_chain.txt")
    cfg = {
        "expname": exp, "basedir": basedir, "datadir": data,
        "dataset_type": "blender", "no_batching": "True",
        "use_viewdirs": "True", "white_bkgd": "True",
        "lrate": "5e-4", "lrate_decay": "250",
        "N_rand": "1024", "N_samples": "64", "N_importance": "128",
        "netdepth": "8", "netwidth": "256",
        "netdepth_fine": "8", "netwidth_fine": "256",
        "multires": "10", "multires_views": "4",
        "precrop_iters": "500", "precrop_frac": "0.5", "testskip": "1",
        "i_weights": str(ITERS), "i_print": "1000",
        "i_video": "10000000", "i_testset": "10000000", "i_img": "10000000",
        "half_res": "False",
        # mesh flags (reference drill recipe, README.md:32-53)
        "resolution": str(RES), "threshold": os.environ.get("SW_THRESH", "25"),
        "real_length": str(REAL_LENGTH),
    }
    with open(cfgp, "w") as f:
        for k, v in cfg.items():
            f.write(f"{k} = {v}\n")

    os.environ["SWNERF_MAX_ITERS"] = str(ITERS + 1)
    os.environ.setdefault("SWNERF_SEED", "0")
    # Bounds covering the textured scene (checker sphere r=0.8 left, box
    # right, occluder above) — the reference hardcodes scene bounds and
    # tells you to edit the source (README.md:39); ours takes an env.
    os.environ.setdefault("SWNERF_MESH_BOUNDS",
                          "[[-2.0,2.0],[-2.0,2.0],[-2.0,2.0]]")

    from swnerf_tpu.pipelines.run_nerf import train

    t0 = time.time()
    train(["--config", cfgp])
    result["train_s"] = round(time.time() - t0, 1)
    print(f"TRAIN {ITERS} iters in {result['train_s']}s", flush=True)

    from swnerf_tpu.pipelines import extract_mesh

    t1 = time.time()
    extract_mesh.main(["--config", cfgp])
    result["extract_s"] = round(time.time() - t1, 1)

    from swnerf_tpu.utils.mesh import load_obj

    verts, faces, _ = load_obj(os.path.join(basedir, exp, "mesh.obj"))
    result["mesh_verts"], result["mesh_faces"] = len(verts), len(faces)
    result["mesh_bbox"] = [verts.min(0).tolist(), verts.max(0).tolist()]

    from swnerf_tpu.pipelines import transform_mesh

    t2 = time.time()
    transform_mesh.main(["--config", cfgp])
    result["transform_s"] = round(time.time() - t2, 1)

    tverts, _tf, _ = load_obj(os.path.join(basedir, exp, "transformed_mesh.obj"))
    result["transformed_bbox"] = [tverts.min(0).tolist(), tverts.max(0).tolist()]
    # Ground truth: scale must be REAL_LENGTH / MARKER_EDGE = 0.25.
    result["expected_scale"] = REAL_LENGTH / MARKER_EDGE
    result["recovered_scale"] = float(
        (tverts.max(0) - tverts.min(0))[0] / (verts.max(0) - verts.min(0))[0]
    )
    with open(os.path.join(OUT, "result_sw_chain.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
