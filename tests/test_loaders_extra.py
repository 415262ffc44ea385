"""Fixture tests for the LINEMOD and DeepVoxels loaders: tiny on-disk
transforms/intrinsics trees parsed end-to-end, pinning the format-specific
quirks (absolute file paths + floor/ceil near-far, load_LINEMOD.py:37-93;
intrinsics.txt rescaling + pose-file y/z flip, load_deepvoxels.py:6-108)."""

import json
import os

import numpy as np
import pytest


def _write_linemod_dataset(root, n=3, size=8, focal=100.0, near=0.37, far=1.61):
    """transforms_{split}.json with ABSOLUTE file paths and per-split
    near/far metadata (load_LINEMOD.py:57,74-75,91-92)."""
    import imageio.v2 as imageio

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    K = [[focal, 0.0, size / 2], [0.0, focal, size / 2], [0.0, 0.0, 1.0]]
    for s in ("train", "val", "test"):
        frames = []
        os.makedirs(os.path.join(root, s), exist_ok=True)
        for i in range(n):
            # LINEMOD stores absolute paths in the json.
            fp = os.path.abspath(os.path.join(root, s, f"{i:04d}.png"))
            imageio.imwrite(fp, rng.uniform(0, 255, (size, size, 3)).astype(np.uint8))
            frames.append(
                {
                    "file_path": fp,
                    "transform_matrix": np.eye(4).tolist(),
                    "intrinsic_matrix": K,
                }
            )
        meta = {"frames": frames, "near": near + (0.01 if s == "test" else 0.0),
                "far": far - (0.01 if s == "train" else 0.0)}
        with open(os.path.join(root, f"transforms_{s}.json"), "w") as f:
            json.dump(meta, f)
    return K


class TestLinemodLoader:
    def test_parse_shapes_K_nearfar(self, tmp_path):
        from swnerf_tpu.data.linemod import load_linemod_data

        K_in = _write_linemod_dataset(str(tmp_path), n=4, size=8, focal=100.0)
        imgs, poses, render_poses, hwf, K, i_split, near, far = load_linemod_data(
            str(tmp_path), half_res=False, testskip=2
        )
        # train unstrided, val/test strided by 2 (load_LINEMOD.py:49-50).
        assert [len(s) for s in i_split] == [4, 2, 2]
        assert imgs.shape == (8, 8, 8, 3)
        assert imgs.dtype == np.float32 and imgs.max() <= 1.0
        assert poses.shape == (8, 4, 4)
        assert render_poses.shape == (40, 4, 4)
        H, W, focal = hwf
        assert (H, W) == (8, 8)
        # K comes from the TEST split's first frame (load_LINEMOD.py:74-75).
        np.testing.assert_array_equal(np.asarray(K), np.asarray(K_in))
        assert focal == 100.0
        # near/far = floor/ceil over split metadata (load_LINEMOD.py:91-92).
        assert near == 0.0  # floor(min(0.37, 0.38))
        assert far == 2.0  # ceil(max(1.60, 1.61))

    def test_half_res(self, tmp_path):
        from swnerf_tpu.data.linemod import load_linemod_data

        _write_linemod_dataset(str(tmp_path), n=2, size=8, focal=64.0)
        imgs, _, _, hwf, _, _, _, _ = load_linemod_data(
            str(tmp_path), half_res=True, testskip=1
        )
        H, W, focal = hwf
        assert (H, W) == (4, 4)
        assert focal == 32.0
        assert imgs.shape[1:] == (4, 4, 3)


def _write_dv_dataset(root, scene="cube", n=3, size=8, focal=50.0, height=16.0):
    """train/test/validation dirs with intrinsics.txt, pose/*.txt, rgb/*.png
    (load_deepvoxels.py:6-108 layout)."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(1)
    poses = {}
    for split, count in (("train", n), ("test", n + 1), ("validation", n + 2)):
        base = os.path.join(root, split, scene)
        os.makedirs(os.path.join(base, "pose"), exist_ok=True)
        os.makedirs(os.path.join(base, "rgb"), exist_ok=True)
        with open(os.path.join(base, "intrinsics.txt"), "w") as f:
            f.write(f"{focal} {height/2} {height/2}\n")  # focal cx cy
            f.write("0. 0. 0.\n")  # grid barycenter
            f.write("0.5\n")  # near plane
            f.write("1.0\n")  # scale
            f.write(f"{height} {height}\n")  # height width
            f.write("0\n")  # world2cam flag
        ps = []
        for i in range(count):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.standard_normal(3)
            ps.append(c2w)
            with open(os.path.join(base, "pose", f"{i:03d}.txt"), "w") as f:
                f.write(" ".join(str(x) for x in c2w.reshape(-1)))
            imageio.imwrite(
                os.path.join(base, "rgb", f"{i:03d}.png"),
                rng.uniform(0, 255, (size, size, 3)).astype(np.uint8),
            )
        poses[split] = np.stack(ps)
    return poses


class TestDeepVoxelsLoader:
    def test_parse_intrinsics_and_poses(self, tmp_path):
        from swnerf_tpu.data.deepvoxels import load_dv_data

        raw_poses = _write_dv_dataset(str(tmp_path), n=3, focal=50.0, height=16.0)
        imgs, poses, render_poses, hwf, i_split = load_dv_data(
            scene="cube", basedir=str(tmp_path), testskip=2
        )
        H, W, focal = hwf
        assert (H, W) == (512, 512)
        # focal rescaled to the 512 target side (load_deepvoxels.py:29-31).
        assert focal == pytest.approx(512.0 / 16.0 * 50.0)
        # split order is [train, VAL, test]; val/test strided by testskip.
        assert [len(s) for s in i_split] == [3, 3, 2]
        assert imgs.shape == (8, 8, 8, 3)
        # The y/z pose flip (load_deepvoxels.py:65-82): columns 1 and 2
        # negated relative to the on-disk matrices.
        expect = raw_poses["train"][0].copy()
        expect[:, 1] *= -1
        expect[:, 2] *= -1
        np.testing.assert_allclose(poses[0], expect[:3, :4], atol=1e-6)
        # render path = strided test poses.
        assert render_poses.shape == (2, 3, 4)
        expect_t = raw_poses["test"][0].copy()
        expect_t[:, 1] *= -1
        expect_t[:, 2] *= -1
        np.testing.assert_allclose(render_poses[0], expect_t[:3, :4], atol=1e-6)

    def test_scene_dispatch_in_cli(self, tmp_path):
        """load_scene routes --dataset_type deepvoxels with --shape and
        derives near/far from the pose hemisphere (run.py:476-481)."""
        import argparse

        from swnerf_tpu.pipelines.common import load_scene

        _write_dv_dataset(str(tmp_path), n=3)
        args = argparse.Namespace(
            dataset_type="deepvoxels", shape="cube", datadir=str(tmp_path),
            testskip=2, white_bkgd=False, render_test=False,
        )
        scene = load_scene(args)
        hemi_r = float(np.mean(np.linalg.norm(scene.poses[:, :3, -1], axis=-1)))
        assert scene.near == pytest.approx(hemi_r - 1.0)
        assert scene.far == pytest.approx(hemi_r + 1.0)
        assert scene.H == scene.W == 512


class TestSyntheticLLFFScene:
    """The forward-facing LLFF fixture writer (data/synthetic.py
    write_llff_scene) feeds the llff parity mode; pin its on-disk schema by
    loading it through OUR loader and — when the reference tree is present —
    through the reference's load_llff.py, asserting identical outputs."""

    def _write(self, root, n=6, size=8):
        from swnerf_tpu.data.synthetic import write_llff_scene

        write_llff_scene(str(root), n_images=n, size=size, n_samples=16)

    def test_loads_through_our_loader(self, tmp_path):
        from swnerf_tpu.data.llff import load_llff_data

        self._write(tmp_path)
        images, poses, bds, render_poses, i_test = load_llff_data(
            str(tmp_path), factor=1, recenter=True, bd_factor=0.75,
        )
        assert images.shape == (6, 8, 8, 3) and images.max() <= 1.0
        assert poses.shape == (6, 3, 5)
        # hwf column carries the written intrinsics.
        np.testing.assert_allclose(poses[0, :, 4], [8, 8, 0.9 * 8], rtol=1e-6)
        # bd_factor rescale normalizes the nearest bound to 1/0.75.
        assert bds.min() == pytest.approx(1.0 / 0.75, rel=1e-5)
        assert 0 <= i_test < 6

    def test_matches_reference_loader(self, tmp_path):
        """Byte-identical pixels and bit-close poses through BOTH loader
        implementations (ours vs dataloader/load_llff.py) — the images_1/
        pre-population must short-circuit the reference's mogrify shell-out."""
        import importlib.util

        ref_path = "/root/reference/dataloader/load_llff.py"
        if not os.path.exists(ref_path):
            pytest.skip("reference tree not present")
        spec = importlib.util.spec_from_file_location("ref_load_llff", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        from swnerf_tpu.data.llff import load_llff_data

        self._write(tmp_path)
        ours = load_llff_data(str(tmp_path), factor=1, recenter=True, bd_factor=0.75)
        theirs = ref.load_llff_data(
            str(tmp_path), factor=1, recenter=True, bd_factor=0.75, spherify=False
        )
        np.testing.assert_array_equal(ours[0], np.asarray(theirs[0], np.float32))
        np.testing.assert_allclose(ours[1], theirs[1], atol=1e-5)  # poses
        np.testing.assert_allclose(ours[2], theirs[2], atol=1e-5)  # bds
        assert int(ours[4]) == int(theirs[4])  # holdout view

    def test_cli_scene_ndc_batching(self, tmp_path):
        """load_scene wires the llff fixture into the NDC + pooled path:
        near/far become the 0/1 NDC planes and llffhold strides the split."""
        import argparse

        from swnerf_tpu.pipelines.common import load_scene

        self._write(tmp_path)
        args = argparse.Namespace(
            dataset_type="llff", datadir=str(tmp_path), factor=1, llffhold=4,
            spherify=False, no_ndc=False, render_test=False,
        )
        scene = load_scene(args)
        assert scene.ndc and scene.near == 0.0 and scene.far == 1.0
        np.testing.assert_array_equal(scene.i_test, [0, 4])
        assert len(scene.i_train) == 4
