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
