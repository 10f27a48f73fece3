"""Data layer: COLMAP io round-trip + pose conventions, transforms.json
parsing, the GaussianGrasper channel-directory convention, and fixed-size
mask sampling. Fixtures are generated into tmp_path (the analog of the
reference's tests/data/lego_test miniature datasets)."""

import json
from pathlib import Path

import numpy as np
import pytest

from gaussiangrasper_tpu.data import colmap_io as cio
from gaussiangrasper_tpu.data.dataparsers.colmap import ColmapDataParser
from gaussiangrasper_tpu.data.dataparsers.transforms_json import TransformsJsonParser
from gaussiangrasper_tpu.data.manager import FullImageDatamanager, SamplerConfig

W, H = 40, 30


def write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def scene_dir(tmp_path):
    """Synthetic GaussianGrasper-convention dataset: 2 views with every
    channel directory populated."""
    root = tmp_path / "scene"
    for d in ("images", "depths", "normals", "masks", "boundary_mask", "features"):
        (root / d).mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        name = f"frame_{i:04d}.png"
        write_png(root / "images" / name, rng.integers(0, 255, (H, W, 3), np.uint8))
        np.save(root / "depths" / f"frame_{i:04d}.npy",
                rng.random((H, W)).astype(np.float32) + 1.0)
        n = rng.normal(size=(H, W, 3)).astype(np.float32)
        np.save(root / "normals" / f"frame_{i:04d}.npy", n)
        sam = np.full((H, W), -1, np.int32)
        sam[:10, :10] = 0
        sam[15:25, 20:35] = 1
        np.save(root / "masks" / f"frame_{i:04d}.npy", sam)
        np.save(root / "boundary_mask" / f"frame_{i:04d}.npy",
                np.ones((H, W), np.uint8))
        np.save(root / "features" / f"frame_{i:04d}.npy",
                rng.random((H // 2, W // 2, 512)).astype(np.float32))
        c2w = np.eye(4)
        c2w[2, 3] = float(i)
        frames.append({
            "file_path": f"images/{name}",
            "transform_matrix": c2w.tolist(),
        })
    meta = {"fl_x": 35.0, "fl_y": 35.0, "cx": W / 2, "cy": H / 2,
            "w": W, "h": H, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


class TestColmapIO:
    def test_text_round_trip(self, tmp_path):
        cams = {1: cio.ColmapCamera("PINHOLE", 64, 48, np.array([50.0, 51.0, 32.0, 24.0]))}
        q = np.array([0.9, 0.1, 0.2, 0.1])
        q /= np.linalg.norm(q)
        ims = {1: cio.ColmapImage(q, np.array([0.1, -0.2, 1.5]), 1, "a.png")}
        xyz = np.random.default_rng(0).normal(size=(20, 3))
        rgb = np.random.default_rng(1).integers(0, 255, (20, 3)).astype(np.uint8)
        cio.write_cameras_text(tmp_path / "cameras.txt", cams)
        cio.write_images_text(tmp_path / "images.txt", ims)
        cio.write_points3d_text(tmp_path / "points3D.txt", xyz, rgb)
        cams2 = cio.read_cameras_text(tmp_path / "cameras.txt")
        ims2 = cio.read_images_text(tmp_path / "images.txt")
        xyz2, rgb2, _ = cio.read_points3d_text(tmp_path / "points3D.txt")
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        np.testing.assert_allclose(ims2[1].qvec, q)
        np.testing.assert_allclose(xyz2, xyz)
        assert (rgb2 == rgb).all()

    def test_projection_convention_matches_colmap(self, tmp_path):
        """A COLMAP 3D point must land at COLMAP's uv (shifted by the -0.5
        integer-pixel-center convention) after the full parse+project path."""
        import jax.numpy as jnp

        from gaussiangrasper_tpu.core.cameras import view_matrix
        from gaussiangrasper_tpu.ops.projection import project_gaussians

        rng = np.random.default_rng(2)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3) * 0.1
        r = cio.qvec_to_rotmat(q)
        # a world point 2m in front of the camera
        p_cam = np.array([0.3, -0.2, 2.0])
        p_world = r.T @ (p_cam - t)
        fx, fy, cx, cy = 50.0, 55.0, 32.0, 24.0
        uv_colmap = np.array([fx * p_cam[0] / p_cam[2] + cx,
                              fy * p_cam[1] / p_cam[2] + cy])

        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        cio.write_cameras_text(sparse / "cameras.txt",
                               {1: cio.ColmapCamera("PINHOLE", 64, 48,
                                                    np.array([fx, fy, cx, cy]))})
        cio.write_images_text(sparse / "images.txt",
                              {1: cio.ColmapImage(q, t, 1, "a.png")})
        (tmp_path / "images").mkdir()

        parser = ColmapDataParser(
            tmp_path, colmap_path="sparse/0", load_3d_points=False,
            auto_scale_poses=False, orientation_method="none",
            center_method="none",
        )
        out = parser.parse()
        cam = out.cameras[0]
        vm = view_matrix(jnp.asarray(cam.camera_to_world))
        proj = project_gaussians(
            jnp.asarray(p_world, jnp.float32)[None],
            jnp.full((1, 3), 0.01), jnp.array([[1.0, 0, 0, 0]]),
            vm, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        )
        np.testing.assert_allclose(
            np.asarray(proj.xys[0]), uv_colmap - 0.5, atol=1e-4
        )
        np.testing.assert_allclose(float(proj.depths[0]), 2.0, atol=1e-5)

    def test_seed_points_follow_transform(self, tmp_path):
        rng = np.random.default_rng(3)
        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        (tmp_path / "images").mkdir()
        n_cams = 4
        ims = {}
        for i in range(n_cams):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            ims[i + 1] = cio.ColmapImage(q, rng.normal(size=3), 1, f"{i}.png")
        cio.write_cameras_text(sparse / "cameras.txt",
                               {1: cio.ColmapCamera("PINHOLE", 8, 8,
                                                    np.array([5.0, 5.0, 4.0, 4.0]))})
        cio.write_images_text(sparse / "images.txt", ims)
        xyz = rng.normal(size=(10, 3))
        rgb = rng.integers(0, 255, (10, 3)).astype(np.uint8)
        cio.write_points3d_text(sparse / "points3D.txt", xyz, rgb)
        out = ColmapDataParser(tmp_path, colmap_path="sparse/0").parse()
        sp = out.seed_points
        assert sp is not None
        # seeds = transform @ xyz * scale
        expect = (xyz @ out.dataparser_transform[:3, :3].T
                  + out.dataparser_transform[:3, 3]) * out.dataparser_scale
        np.testing.assert_allclose(sp[0], expect, atol=1e-5)


class TestManager:
    def test_batch_shapes_and_scaling(self, scene_dir):
        out = TransformsJsonParser(scene_dir).parse()
        # pretend the dataparser rescaled the world by 0.5
        out.dataparser_scale = 0.5
        dm = FullImageDatamanager(
            out, SamplerConfig(max_groups=4, pairs_per_group=8, num_points=32)
        )
        cam, batch = dm.get_batch(0)
        assert cam.width == W and cam.height == H
        assert batch["image"].shape == (H, W, 3)
        assert batch["pair_a"].shape == (4, 8, 2)
        assert batch["points"].shape == (32, 2)
        assert batch["gt_clip"].shape == (32, 512)
        # depth scaled by dataparser scale
        raw = np.load(scene_dir / "depths" / "frame_0000.npy")
        np.testing.assert_allclose(np.asarray(batch["depth"]), raw * 0.5, atol=1e-6)

    def test_pairs_within_same_mask(self, scene_dir):
        out = TransformsJsonParser(scene_dir).parse()
        dm = FullImageDatamanager(
            out, SamplerConfig(max_groups=4, pairs_per_group=16, num_points=16)
        )
        _, batch = dm.get_batch(0)
        sam = np.load(scene_dir / "masks" / "frame_0000.npy")
        pa = np.asarray(batch["pair_a"])
        pb = np.asarray(batch["pair_b"])
        pv = np.asarray(batch["pair_valid"])
        gv = np.asarray(batch["group_valid"])
        assert gv.sum() == 2  # two mask ids present
        for g in range(4):
            if not gv[g]:
                continue
            ids_a = sam[pa[g, :, 0], pa[g, :, 1]]
            ids_b = sam[pb[g, :, 0], pb[g, :, 1]]
            assert (ids_a == ids_a[0]).all()
            assert (ids_a == ids_b).all()
            assert (ids_a > -1).all()
            assert pv[g].all()

    def test_distill_points_hit_masks(self, scene_dir):
        out = TransformsJsonParser(scene_dir).parse()
        dm = FullImageDatamanager(out, SamplerConfig(num_points=64))
        _, batch = dm.get_batch(1)
        sam = np.load(scene_dir / "masks" / "frame_0001.npy")
        pts = np.asarray(batch["points"])
        valid = np.asarray(batch["point_valid"])
        assert valid.any()
        assert (sam[pts[valid, 0], pts[valid, 1]] > -1).all()
        # gt clip pulled from the half-res feature map at scaled coords
        feats = np.load(scene_dir / "features" / "frame_0001.npy")
        i = int(np.nonzero(valid)[0][0])
        fy, fx = pts[i, 0] * feats.shape[0] // H, pts[i, 1] * feats.shape[1] // W
        np.testing.assert_allclose(
            np.asarray(batch["gt_clip"])[i], feats[fy, fx], atol=1e-6
        )

    def test_epoch_covers_all_cameras(self, scene_dir):
        out = TransformsJsonParser(scene_dir).parse()
        dm = FullImageDatamanager(out, SamplerConfig(num_points=8))
        seen = {dm.next_train()[0] for _ in range(2)}
        assert seen == {0, 1}
