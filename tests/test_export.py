"""Exporter units: marching tetrahedra surfaces a known SDF; TSDF fusion
reconstructs a plane; unprojection round-trips; point-cloud CLI runs on the
demo run (covered by test_cli for the .ply gaussian export)."""

import numpy as np

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.scripts.export_pointcloud import (
    TSDFVolume,
    marching_tetrahedra,
    unproject_view,
    write_ply_points,
)


def test_marching_tetrahedra_sphere():
    r = 32
    g = (np.arange(r) + 0.5) / r - 0.5
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(xx**2 + yy**2 + zz**2) - 0.3  # sphere radius .3
    verts, faces = marching_tetrahedra(
        sdf.astype(np.float32), mask=np.ones_like(sdf, bool),
        origin=np.array([-0.5, -0.5, -0.5]), scale=np.array([1 / r] * 3),
    )
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.3, atol=0.02)
    assert radii.std() < 0.02
    assert faces.max() < len(verts)


def test_unprojection_plane_depth():
    cam = Camera.create(40.0, 40.0, 16.0, 12.0, np.eye(4)[:3], 32, 24)
    depth = np.full((24, 32), 2.0, np.float32)
    rgb = np.zeros((24, 32, 3))
    xyz, _ = unproject_view(depth, rgb, cam, max_depth=5.0)
    # OpenGL camera at origin looking down -z: all points at z=-2
    np.testing.assert_allclose(xyz[:, 2], -2.0, atol=1e-5)


def test_tsdf_reconstructs_plane():
    cam = Camera.create(40.0, 40.0, 16.0, 12.0, np.eye(4)[:3], 32, 24)
    depth = np.full((24, 32), 1.0, np.float32)
    bounds = np.array([[-0.5, -0.5, -1.3], [0.5, 0.5, -0.7]])
    vol = TSDFVolume(bounds, resolution=48, trunc=0.1)
    vol.integrate(depth, cam)
    assert (vol.weight > 0).sum() > 0
    verts, faces = vol.extract_mesh()
    assert len(verts) > 10
    # surface near z = -1
    np.testing.assert_allclose(np.median(verts[:, 2]), -1.0, atol=0.05)


def test_ply_points_round_trip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).integers(0, 255, (100, 3))
    path = tmp_path / "p.ply"
    write_ply_points(path, xyz, rgb)
    data = path.read_bytes()
    assert b"element vertex 100" in data
    body = data.split(b"end_header\n", 1)[1]
    rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    np.testing.assert_allclose(rec["xyz"], xyz, atol=1e-6)


class TestTextureBake:
    """Texture baking (scripts/export_texture.py — the reference's
    exporter/texture_utils.py path)."""

    def test_unwrap_charts_are_disjoint_and_in_bounds(self):
        from gaussiangrasper_tpu.scripts.export_texture import (
            face_texels,
            unwrap_per_triangle,
        )

        faces = np.arange(30).reshape(10, 3) % 7
        uvs, grid, tex = unwrap_per_triangle(faces, cell_px=8)
        assert uvs.shape == (10, 3, 2)
        assert (uvs >= 0).all() and (uvs <= 1).all()
        verts = np.random.default_rng(0).normal(size=(7, 3))
        pos, tex_xy, inside = face_texels(verts, faces, grid, 8)
        # chart texels never collide across faces
        flat = tex_xy.reshape(-1, 2)
        keys = flat[:, 1] * tex + flat[:, 0]
        assert len(np.unique(keys)) == len(keys)

    def test_bake_picks_visible_view(self):
        """A point visible in view A (red) and occluded in view B (blue)
        bakes red."""
        from gaussiangrasper_tpu.core.cameras import Camera
        from gaussiangrasper_tpu.scripts.export_texture import bake_from_views

        cam_a = Camera.create(20.0, 20.0, 8.0, 6.0, np.eye(4)[:3], 16, 12)
        pose_b = np.eye(4)[:3].copy()
        pose_b[0, 3] = 5.0  # far to the side; point projects out of view
        cam_b = Camera.create(20.0, 20.0, 8.0, 6.0, pose_b, 16, 12)
        img_a = np.zeros((12, 16, 3)); img_a[..., 0] = 1.0   # red
        img_b = np.zeros((12, 16, 3)); img_b[..., 2] = 1.0   # blue
        dep_a = np.full((12, 16), 2.0)
        dep_b = np.full((12, 16), 0.5)  # depth test fails for the point
        pos = np.array([[0.0, 0.0, -2.0]])
        nrm = np.array([[0.0, 0.0, 1.0]])  # faces cam A
        rgb = bake_from_views(pos, nrm, [img_a, img_b], [dep_a, dep_b],
                              [cam_a, cam_b])
        np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0], atol=1e-6)

    def test_obj_round_trip(self, tmp_path):
        from gaussiangrasper_tpu.scripts.export_texture import (
            bake_mesh_texture,
            write_obj,
        )
        from gaussiangrasper_tpu.core.cameras import Camera

        verts = np.array([[0, 0, -2.0], [0.5, 0, -2.0], [0, 0.5, -2.0]])
        faces = np.array([[0, 1, 2]])
        cam = Camera.create(20.0, 20.0, 8.0, 6.0, np.eye(4)[:3], 16, 12)
        img = np.full((12, 16, 3), 0.25)
        dep = np.full((12, 16), 2.0)
        uvs, texture = bake_mesh_texture(verts, faces, [img], [dep], [cam],
                                         cell_px=8)
        path = write_obj(tmp_path, "m", verts, faces, uvs, texture)
        text = path.read_text()
        assert text.count("\nv ") == 3
        assert text.count("\nvt ") == 3
        assert "mtllib m.mtl" in text
        assert (tmp_path / "m.png").exists()
        # baked color reaches the texture where charts live
        assert abs(np.median(texture[texture != 0.5]) - 0.25) < 0.02
