"""Config-parser and dataset-loader tests (synthetic on-disk fixtures)."""

import json
import os

import numpy as np
import pytest

from swnerf_tpu.utils.config import config_parser, config_parser_dnerf, parse_config_file


class TestConfigParser:
    def test_defaults_match_reference(self):
        args = config_parser().parse_args([])
        assert args.netdepth == 8 and args.netwidth == 256
        assert args.N_rand == 4096 and args.lrate == 5e-4 and args.lrate_decay == 250
        assert args.chunk == 32768 and args.netchunk == 65536
        assert args.N_samples == 64 and args.N_importance == 0
        assert args.multires == 10 and args.multires_views == 4
        assert args.testskip == 8 and args.llffhold == 8
        assert args.i_weights == 10000 and args.i_video == 50000
        assert args.resolution == 128 and args.threshold == 8
        assert args.real_length == pytest.approx(0.005)
        assert not args.use_viewdirs and not args.white_bkgd

    def test_dnerf_defaults(self):
        args = config_parser_dnerf().parse_args([])
        assert args.nerf_type == "original" and args.N_iter == 500000
        assert args.testskip == 2
        assert args.tv_loss_weight == pytest.approx(1e-4)
        assert args.layer_num == 4 and args.global_optimization_epoch == 120
        assert args.i_weights == 5000 and args.i_video == 40000
        assert not args.not_zero_canonical and not args.use_two_models_for_fine

    def test_config_file_layering(self, tmp_path):
        """Reference-style config txt: key = value lines, bare booleans,
        duplicated keys (last wins), CLI overrides file."""
        cfg = tmp_path / "lego.txt"
        cfg.write_text(
            "\n".join(
                [
                    "expname = blender_paper_lego",
                    "datadir = ./data/nerf_synthetic/lego",
                    "dataset_type = blender",
                    "no_batching = True",
                    "use_viewdirs = True",
                    "use_viewdirs = True",
                    "white_bkgd = True",
                    "lrate_decay = 500",
                    "N_samples = 64",
                    "N_importance = 128",
                    "N_rand = 1024",
                    "precrop_iters = 500",
                    "precrop_frac = 0.5",
                    "half_res = True",
                    "render_only",  # bare flag
                ]
            )
        )
        args = config_parser().parse_args(["--config", str(cfg)])
        assert args.expname == "blender_paper_lego"
        assert args.dataset_type == "blender"
        assert args.no_batching and args.use_viewdirs and args.white_bkgd
        assert args.lrate_decay == 500 and args.N_importance == 128
        assert args.N_rand == 1024 and args.precrop_iters == 500
        assert args.half_res and args.render_only

        # CLI overrides file.
        args = config_parser().parse_args(
            ["--config", str(cfg), "--N_rand", "512", "--render_factor", "4"]
        )
        assert args.N_rand == 512 and args.render_factor == 4

    def test_comments_and_unknown_keys(self, tmp_path):
        cfg = tmp_path / "c.txt"
        cfg.write_text("# comment\nexpname = t\nbogus_key = 3\n")
        vals = parse_config_file(str(cfg))
        assert vals == {"expname": "t", "bogus_key": "3"}
        args = config_parser().parse_args(["--config", str(cfg)])
        assert args.expname == "t"


def _write_blender_dataset(root, n=4, size=8, dynamic=False, single_file=False):
    """Create a minimal transforms_{split}.json + png tree."""
    import imageio.v2 as imageio

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    def frames_for(split, n):
        frames = []
        for i in range(n):
            rel = f"./{split}/r_{i}"
            img = (rng.uniform(0, 255, (size, size, 4))).astype(np.uint8)
            os.makedirs(os.path.join(root, split), exist_ok=True)
            imageio.imwrite(os.path.join(root, rel + ".png"), img)
            frame = {
                "file_path": rel,
                "transform_matrix": np.eye(4).tolist(),
            }
            if dynamic:
                frame["time"] = i / max(n - 1, 1)
            frames.append(frame)
        return frames

    if single_file:
        meta = {"camera_angle_x": 0.7, "frames": frames_for("all", n)}
        with open(os.path.join(root, "transforms.json"), "w") as f:
            json.dump(meta, f)
    else:
        for split in ("train", "val", "test"):
            meta = {"camera_angle_x": 0.7, "frames": frames_for(split, n)}
            with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
                json.dump(meta, f)


class TestBlenderLoader:
    def test_static_splits(self, tmp_path):
        from swnerf_tpu.data.blender import load_blender_data

        _write_blender_dataset(str(tmp_path), n=4, size=8)
        imgs, poses, render_poses, hwf, i_split = load_blender_data(str(tmp_path), testskip=2)
        assert imgs.shape == (4 + 2 + 2, 8, 8, 4)
        assert imgs.dtype == np.float32 and imgs.max() <= 1.0
        assert poses.shape[1:] == (4, 4)
        assert render_poses.shape == (360, 4, 4)
        H, W, focal = hwf
        assert (H, W) == (8, 8)
        assert focal == pytest.approx(0.5 * 8 / np.tan(0.35))
        assert [len(s) for s in i_split] == [4, 2, 2]

    def test_auto_split_single_file(self, tmp_path):
        from swnerf_tpu.data.blender import load_blender_data

        _write_blender_dataset(str(tmp_path), n=10, size=8, single_file=True)
        imgs, poses, _, _, i_split = load_blender_data(str(tmp_path), testskip=1)
        assert [len(s) for s in i_split] == [8, 1, 1]

    def test_half_res(self, tmp_path):
        from swnerf_tpu.data.blender import load_blender_data

        _write_blender_dataset(str(tmp_path), n=2, size=8)
        imgs, _, _, hwf, _ = load_blender_data(str(tmp_path), half_res=True, testskip=1)
        assert imgs.shape[1:3] == (4, 4)
        assert hwf[0] == 4 and hwf[2] == pytest.approx(0.5 * 0.5 * 8 / np.tan(0.35))

    def test_dynamic_times(self, tmp_path):
        from swnerf_tpu.data.blender import load_blender_dynamic_data

        _write_blender_dataset(str(tmp_path), n=5, size=8, dynamic=True)
        imgs, poses, times, rposes, rtimes, hwf, i_split = load_blender_dynamic_data(
            str(tmp_path), testskip=1
        )
        assert times[0] == 0.0 and times[4] == 1.0
        assert rposes.shape == (40, 4, 4)
        np.testing.assert_allclose(rtimes, np.linspace(0, 1, 40), atol=1e-6)


class TestCustomLoader:
    def test_split_and_alpha_pad(self, tmp_path):
        import imageio.v2 as imageio

        from swnerf_tpu.data.custom import load_custom_data

        root = str(tmp_path)
        rng = np.random.default_rng(0)
        frames = []
        for i in range(10):
            rel = f"img_{i}.png"
            imageio.imwrite(
                os.path.join(root, rel), rng.uniform(0, 255, (8, 8, 3)).astype(np.uint8)
            )
            frames.append({"file_path": rel, "transform_matrix": np.eye(4).tolist()})
        meta = {"fl_x": 10.0, "fl_y": 12.0, "cx": 4.0, "cy": 4.0, "frames": frames}
        with open(os.path.join(root, "transforms.json"), "w") as f:
            json.dump(meta, f)

        imgs, poses, rposes, K, hwf, i_split = load_custom_data(root)
        assert imgs.shape == (10, 8, 8, 4)  # alpha padded
        assert (imgs[..., 3] == 1.0).all()
        assert [len(s) for s in i_split] == [8, 1, 1]
        np.testing.assert_allclose(K, [[10, 0, 4], [0, 12, 4], [0, 0, 1]])
        assert hwf[2] == pytest.approx(11.0)
        # Seeded split is reproducible.
        _, _, _, _, _, i_split2 = load_custom_data(root)
        for a, b in zip(i_split, i_split2):
            np.testing.assert_array_equal(a, b)


class TestLLFFLoader:
    def _write_llff(self, root, n=6, size=16):
        import imageio.v2 as imageio

        rng = np.random.default_rng(0)
        os.makedirs(os.path.join(root, "images"))
        for i in range(n):
            imageio.imwrite(
                os.path.join(root, "images", f"{i:03d}.png"),
                rng.uniform(0, 255, (size, size, 3)).astype(np.uint8),
            )
        poses = np.zeros((n, 3, 5))
        for i in range(n):
            th = i * 0.1
            poses[i, :, :4] = np.array(
                [
                    [np.cos(th), 0, np.sin(th), 0.1 * i],
                    [0, 1, 0, 0.05 * i],
                    [-np.sin(th), 0, np.cos(th), 1.0],
                ]
            )
            poses[i, :, 4] = [size, size, 20.0]
        bds = np.stack([np.full(n, 2.0), np.full(n, 8.0)], -1)
        arr = np.concatenate([poses.reshape(n, -1), bds], -1)
        np.save(os.path.join(root, "poses_bounds.npy"), arr)

    def test_load_and_minify(self, tmp_path):
        from swnerf_tpu.data.llff import load_llff_data

        self._write_llff(str(tmp_path))
        images, poses, bds, render_poses, i_test = load_llff_data(
            str(tmp_path), factor=2, spherify=False
        )
        assert images.shape == (6, 8, 8, 3)
        assert poses.shape == (6, 3, 5)
        assert render_poses.shape[0] == 120
        assert 0 <= i_test < 6
        # minified cache created and reused
        assert os.path.isdir(os.path.join(str(tmp_path), "images_2"))
        images2, *_ = load_llff_data(str(tmp_path), factor=2)
        np.testing.assert_allclose(images, images2)
        # bd rescale applied: min bound * bd_factor -> 1/sc
        assert bds.min() == pytest.approx(1.0 / 0.75, rel=1e-5)

    def test_spherify(self, tmp_path):
        from swnerf_tpu.data.llff import load_llff_data

        self._write_llff(str(tmp_path))
        images, poses, bds, render_poses, i_test = load_llff_data(
            str(tmp_path), factor=2, spherify=True
        )
        assert render_poses.shape[0] == 120
        assert np.isfinite(render_poses).all()
