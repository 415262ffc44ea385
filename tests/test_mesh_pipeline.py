"""SW metric pipeline tests: marching tetrahedra, OBJ IO, grid sampling +
mesh extraction on an analytic field, ArUco triangulation + scale solve."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swnerf_tpu.ops.marching import marching_tetrahedra
from swnerf_tpu.utils.mesh import load_obj, save_obj


def _sphere_field(res=32, radius=0.6, extent=1.0):
    x = np.linspace(-extent, extent, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    field = radius - np.sqrt(X**2 + Y**2 + Z**2)  # >0 inside
    spacing = (x[1] - x[0],) * 3
    return field, spacing, (-extent, -extent, -extent)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        field, spacing, origin = _sphere_field()
        verts, faces = marching_tetrahedra(field, 0.0, spacing, origin)
        assert len(verts) > 100 and len(faces) > 100
        r = np.linalg.norm(verts, axis=1)
        # All vertices lie on the iso-surface (within one cell).
        assert np.abs(r - 0.6).max() < 2 * spacing[0]
        assert faces.min() >= 0 and faces.max() < len(verts)

    def test_closed_surface_topology(self):
        """Every edge of a closed surface is shared by exactly 2 faces."""
        field, spacing, origin = _sphere_field(res=24)
        verts, faces = marching_tetrahedra(field, 0.0, spacing, origin)
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_empty_when_no_crossing(self):
        field = np.zeros((8, 8, 8))
        verts, faces = marching_tetrahedra(field, 0.5)
        assert len(verts) == 0 and len(faces) == 0

    def test_level_shifts_radius(self):
        field, spacing, origin = _sphere_field()
        v1, _ = marching_tetrahedra(field, 0.0, spacing, origin)
        v2, _ = marching_tetrahedra(field, 0.2, spacing, origin)  # radius 0.4
        assert abs(np.linalg.norm(v2, axis=1).mean() - 0.4) < 0.05
        assert abs(np.linalg.norm(v1, axis=1).mean() - 0.6) < 0.05

    def test_torus_surface_deviation(self):
        """Analytic-shape sweep beyond the sphere (skimage marching_cubes
        delta, reference extract_mesh.py:97-105): torus SDF — every vertex
        within one cell of the true surface; genus-1 topology preserved
        (V - E + F == 0)."""
        R, r, res, extent = 0.6, 0.25, 40, 1.0
        x = np.linspace(-extent, extent, res)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        q = np.sqrt(X**2 + Y**2) - R
        sdf = np.sqrt(q**2 + Z**2) - r  # <0 inside
        spacing = (x[1] - x[0],) * 3
        verts, faces = marching_tetrahedra(-sdf, 0.0, spacing, (-extent,) * 3)
        assert len(faces) > 500
        qv = np.sqrt(verts[:, 0] ** 2 + verts[:, 1] ** 2) - R
        dev = np.abs(np.sqrt(qv**2 + verts[:, 2] ** 2) - r)
        assert dev.max() < 2 * spacing[0]
        assert dev.mean() < 0.35 * spacing[0]
        # Euler characteristic of a closed genus-1 surface is 0.
        edges = np.unique(
            np.sort(
                np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
                axis=1,
            ),
            axis=0,
        )
        assert len(verts) - len(edges) + len(faces) == 0

    def test_box_surface_deviation(self):
        """Axis-aligned box SDF: vertices within a cell of the true faces,
        extents recovered, Euler characteristic 2 (sphere topology)."""
        h = np.array([0.55, 0.4, 0.3])
        res, extent = 36, 1.0
        x = np.linspace(-extent, extent, res)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        p = np.stack([X, Y, Z], -1)
        q = np.abs(p) - h
        sdf = np.linalg.norm(np.maximum(q, 0.0), axis=-1) + np.minimum(
            q.max(-1), 0.0
        )
        spacing = (x[1] - x[0],) * 3
        verts, faces = marching_tetrahedra(-sdf, 0.0, spacing, (-extent,) * 3)
        assert len(faces) > 500
        qv = np.abs(verts) - h
        dev = np.abs(
            np.linalg.norm(np.maximum(qv, 0.0), axis=-1) + np.minimum(qv.max(-1), 0.0)
        )
        assert dev.max() < 2 * spacing[0]
        # Recovered extents match the analytic box within a cell.
        np.testing.assert_allclose(verts.max(0), h, atol=1.5 * spacing[0])
        np.testing.assert_allclose(verts.min(0), -h, atol=1.5 * spacing[0])
        edges = np.unique(
            np.sort(
                np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
                axis=1,
            ),
            axis=0,
        )
        assert len(verts) - len(edges) + len(faces) == 2


class TestObjIO:
    def test_roundtrip_with_colors(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]], np.float32)
        p = str(tmp_path / "m.obj")
        save_obj(p, verts, faces, colors)
        v, f, c = load_obj(p)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(f, faces)
        np.testing.assert_allclose(c, colors, atol=1e-5)


class TestExtractMesh:
    def test_analytic_field_to_mesh(self):
        from swnerf_tpu.data.synthetic import gt_sphere_raw
        from swnerf_tpu.models.common import Field
        from swnerf_tpu.pipelines.extract_mesh import nerf_to_mesh

        field = Field(
            init=lambda rng: {},
            apply=lambda params, pts, vd, t=None: (gt_sphere_raw(pts), {}),
        )
        bounds = ((-1.5, 1.5), (-1.5, 1.5), (-1.5, 1.5))
        verts, faces, vcol = nerf_to_mesh(
            field, {}, bounds, resolution=24, density_threshold=10.0,
            num_views=4, chunk=512,
        )
        assert len(verts) > 100
        r = np.linalg.norm(verts, axis=1)
        # gt sphere density 20*sigmoid(20*(1-r)) crosses 10 at r == 1.
        assert abs(r.mean() - 1.0) < 0.1
        assert vcol.shape == (len(verts), 3)
        assert (vcol >= 0).all() and (vcol <= 1).all()


def _project(p_world, c2w, intr):
    """Pinhole projection under transform_mesh's +z-forward convention."""
    fl_x, fl_y, cx, cy = intr
    R, t = c2w[:3, :3], c2w[:3, 3]
    p_cam = R.T @ (p_world - t)
    return np.array([fl_x * p_cam[0] / p_cam[2] + cx, fl_y * p_cam[1] / p_cam[2] + cy])


def _looking_cameras(n=6):
    """CV-convention cameras (x right, y DOWN, z forward; det(R)=+1) on a
    circle above the marker plane, looking at the marker center — y-down
    matters: a y-up parameterization renders a mirrored marker, which ArUco
    dictionaries cannot match."""
    cams = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        pos = np.array([0.4 * np.cos(ang), 0.4 * np.sin(ang), 1.0])
        fwd = np.array([0.1, 0.1, 0.0]) - pos  # toward marker center
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4)
        # rotate 180deg about fwd: (-right, -up) keeps det +1 with y down.
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = -right, -up2, fwd, pos
        cams.append(c2w)
    return cams


class TestMetricScale:
    MARKER = np.array(
        [[0.0, 0.0, 0.0], [0.2, 0.0, 0.0], [0.2, 0.2, 0.0], [0.0, 0.2, 0.0]]
    )
    INTR = (400.0, 400.0, 320.0, 240.0)

    def test_triangulation_recovers_corners(self):
        from swnerf_tpu.pipelines.transform_mesh import calculate_3d_corners

        frame_info = []
        for c2w in _looking_cameras():
            corners_px = np.stack([_project(p, c2w, self.INTR) for p in self.MARKER])
            frame_info.append(
                {"frame": {"transform_matrix": c2w.tolist()}, "id": 0, "corners": corners_px}
            )
        intr8 = self.INTR + (0.0, 0.0, 0.0, 0.0)
        got = calculate_3d_corners(frame_info, intr8, pose_convention="c2w")
        np.testing.assert_allclose(got, self.MARKER, atol=1e-4)

    def test_scale_and_alignment(self):
        from swnerf_tpu.pipelines.transform_mesh import (
            alignment_matrix,
            marker_edge_lengths,
        )

        mean_len, lengths = marker_edge_lengths(self.MARKER)
        assert mean_len == pytest.approx(0.2)
        # real marker is 5 cm -> scale 0.25
        assert 0.05 / mean_len == pytest.approx(0.25)

        # Tilted marker: normal rotates onto +z.
        rot = np.array(
            [[1, 0, 0], [0, np.cos(0.7), -np.sin(0.7)], [0, np.sin(0.7), np.cos(0.7)]]
        )
        tilted = self.MARKER @ rot.T
        T = alignment_matrix(tilted)
        v1, v2 = (T[:3, :3] @ (tilted[1] - tilted[0])), (T[:3, :3] @ (tilted[2] - tilted[0]))
        n = np.cross(v1, v2)
        n /= np.linalg.norm(n)
        np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)

    def test_undistort_identity(self):
        from swnerf_tpu.pipelines.transform_mesh import undistort_points

        pts = np.random.default_rng(0).normal(size=(10, 2)) * 0.1
        np.testing.assert_allclose(undistort_points(pts, 0, 0, 0, 0), pts)
        out = undistort_points(pts, 0.1, 0, 0, 0)
        assert not np.allclose(out, pts)

    def test_aruco_detection(self, tmp_path):
        """cv2 detects a generated marker with a quiet zone."""
        import cv2

        from swnerf_tpu.pipelines.transform_mesh import detect_marker_corners

        d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_1000)
        marker = cv2.aruco.generateImageMarker(d, 42, 120)
        img = np.full((300, 300), 255, np.uint8)
        img[90:210, 90:210] = marker
        os.makedirs(tmp_path / "images_ori", exist_ok=True)
        cv2.imwrite(str(tmp_path / "images_ori" / "f0.png"), img)
        frames = [{"file_path": "images/f0.png", "transform_matrix": np.eye(4).tolist()}]
        info = detect_marker_corners(str(tmp_path), frames)
        assert len(info) == 1 and info[0]["id"] == 42
        assert info[0]["corners"].shape == (4, 2)

    def test_full_scale_solve_from_rendered_views(self, tmp_path):
        """End-to-end cal_scale: render the marker into synthetic pinhole
        views (homography warp), detect, triangulate, recover the metric
        scale of a 0.2-unit marker."""
        import cv2
        import json

        from swnerf_tpu.pipelines.transform_mesh import cal_scale

        d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_4X4_1000)
        msize = 240
        marker = cv2.aruco.generateImageMarker(d, 7, msize)
        # Bitmap corners (TL, TR, BR, BL; bitmap y grows DOWN) pair with
        # world corners of DECREASING y so the physical marker isn't
        # mirrored; world square of edge 0.2 on the z=0 plane.
        world = np.array(
            [[0.0, 0.2, 0.0], [0.2, 0.2, 0.0], [0.2, 0.0, 0.0], [0.0, 0.0, 0.0]]
        )
        src_px = np.array(
            [[0, 0], [msize - 1, 0], [msize - 1, msize - 1], [0, msize - 1]],
            np.float32,
        )
        fl_x, fl_y, cx, cy = 500.0, 500.0, 320.0, 240.0

        os.makedirs(tmp_path / "images_ori", exist_ok=True)
        frames = []
        for k, c2w in enumerate(_looking_cameras(8)):
            dst = np.stack(
                [_project(p, c2w, (fl_x, fl_y, cx, cy)) for p in world]
            ).astype(np.float32)
            Hm, _ = cv2.findHomography(src_px, dst)
            canvas = cv2.warpPerspective(
                marker, Hm, (640, 480), flags=cv2.INTER_LINEAR,
                borderMode=cv2.BORDER_CONSTANT, borderValue=255,
            )
            cv2.imwrite(str(tmp_path / "images_ori" / f"f{k}.png"), canvas)
            frames.append(
                {"file_path": f"images/f{k}.png", "transform_matrix": c2w.tolist()}
            )

        meta = {
            "fl_x": fl_x, "fl_y": fl_y, "cx": cx, "cy": cy,
            "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0,
            "frames": frames,
        }
        with open(tmp_path / "transforms.json", "w") as f:
            json.dump(meta, f)

        scale, transform = cal_scale(str(tmp_path), real_length=0.05, pose_convention="c2w")
        # marker edge 0.2 world units, real 5 cm -> scale 0.25
        assert scale == pytest.approx(0.25, rel=0.02)
        # alignment rotates the (z=0 plane) normal onto z: rotation ~identity
        # up to sign; it must be orthonormal.
        R = transform[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_transform_mesh_applies_scale(self, tmp_path):
        from swnerf_tpu.pipelines.transform_mesh import transform_mesh

        verts = np.array([[1, 0, 0], [0, 2, 0], [0, 0, 3]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        src = str(tmp_path / "mesh.obj")
        dst = str(tmp_path / "transformed_mesh.obj")
        save_obj(src, verts, faces)
        T = np.eye(4)
        T[:3, 3] = [1, 1, 1]
        transform_mesh(src, dst, scale=2.0, transform=T)
        v, f, _ = load_obj(dst)
        np.testing.assert_allclose(v[0], [3, 1, 1], atol=1e-5)
        np.testing.assert_allclose(v[2], [1, 1, 7], atol=1e-5)
