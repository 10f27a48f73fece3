"""Tooling units: schedulers, camera paths, hull masks, relevancy maps."""

import numpy as np
import jax.numpy as jnp

from gaussiangrasper_tpu.core.camera_paths import interpolate_path, spiral_path
from gaussiangrasper_tpu.data.dataparsers.base import ParsedCamera
from gaussiangrasper_tpu.engine.optimizers import (
    cosine_decay_lr,
    exponential_decay_lr,
    multistep_lr,
)
from gaussiangrasper_tpu.scripts.project_hull import hull_mask, project_points
from gaussiangrasper_tpu.scripts.query import relevancy_map


def _cam(x=0.0):
    pose = np.eye(4, dtype=np.float32)[:3]
    pose[0, 3] = x
    return ParsedCamera(fx=50.0, fy=50.0, cx=32.0, cy=24.0, width=64, height=48,
                        camera_to_world=pose)


class TestSchedulers:
    def test_exponential_with_warmup(self):
        lr = exponential_decay_lr(0, 1e-3, 1e-5, 1000, warmup_steps=100)
        assert float(lr) < 1e-3  # still ramping
        lr = exponential_decay_lr(100, 1e-3, 1e-5, 1000, warmup_steps=100)
        np.testing.assert_allclose(float(lr), 1e-3, rtol=1e-5)
        lr = exponential_decay_lr(1000, 1e-3, 1e-5, 1000, warmup_steps=100)
        np.testing.assert_allclose(float(lr), 1e-5, rtol=1e-4)

    def test_multistep(self):
        assert float(multistep_lr(0, 1.0, (10, 20))) == 1.0
        np.testing.assert_allclose(float(multistep_lr(15, 1.0, (10, 20), 0.5)), 0.5)
        np.testing.assert_allclose(float(multistep_lr(25, 1.0, (10, 20), 0.5)), 0.25)

    def test_cosine(self):
        np.testing.assert_allclose(float(cosine_decay_lr(500, 1.0, 500)), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(float(cosine_decay_lr(0, 1.0, 500,
                                                         warmup_steps=10)), 0.0)


class TestCameraPaths:
    def test_interpolate_endpoints_and_count(self):
        cams = [_cam(0.0), _cam(1.0)]
        path = interpolate_path(cams, steps_per_transition=5)
        assert len(path) == 6
        np.testing.assert_allclose(path[0].camera_to_world, cams[0].camera_to_world)
        np.testing.assert_allclose(path[-1].camera_to_world,
                                   cams[-1].camera_to_world)
        # monotone x translation
        xs = [c.camera_to_world[0, 3] for c in path]
        assert all(b >= a for a, b in zip(xs, xs[1:]))

    def test_spiral_returns_to_start(self):
        path = spiral_path(_cam(), n_frames=8, radius=0.2)
        np.testing.assert_allclose(
            path[0].camera_to_world, _cam().camera_to_world, atol=1e-6
        )
        assert len(path) == 8


class TestProjectHull:
    def test_projection_pinhole(self):
        pts = np.array([[0.0, 0.0, 2.0]])
        uv = project_points(pts, np.eye(4), 50.0, 50.0, 32.0, 24.0)
        np.testing.assert_allclose(uv, [[32.0, 24.0]])

    def test_mask_covers_hull(self):
        uv = np.array([[10.0, 10.0], [30.0, 10.0], [20.0, 30.0]])
        m = hull_mask(uv, 64, 48, dilate=0)
        assert m[15, 20]          # inside triangle
        assert not m[5, 50]       # outside
        m_d = hull_mask(uv, 64, 48, dilate=7)
        assert m_d.sum() > m.sum()


class TestRelevancy:
    def test_query_localizes(self):
        f = np.zeros((8, 8, 512), np.float32)
        q = np.zeros(512, np.float32)
        q[0] = 1.0
        f[2, 3] = q  # only this pixel matches
        f[..., 1] += 0.5  # everything has background similarity
        canon = np.zeros((2, 512), np.float32)
        canon[:, 1] = 1.0
        rel = np.asarray(relevancy_map(jnp.asarray(f), jnp.asarray(q),
                                       jnp.asarray(canon)))
        assert rel[2, 3] == rel.max()
        assert rel[2, 3] > 0.5


class TestSegment:
    def test_classic_masks_on_dataset(self, tmp_path):
        from PIL import Image

        from gaussiangrasper_tpu.scripts import segment

        data = tmp_path / "scene"
        (data / "images").mkdir(parents=True)
        # two clearly separated colored squares on black
        img = np.zeros((64, 96, 3), np.uint8)
        img[8:28, 8:38] = (255, 0, 0)
        img[36:60, 50:90] = (0, 0, 255)
        Image.fromarray(img).save(data / "images" / "a.png")
        segment.main(["--data", str(data), "--backend", "classic",
                      "--n-colors", "3", "--min-area", "50"])
        m = np.load(data / "masks" / "a.npy")
        assert m.max() >= 1  # at least two instances (+ background blob)
        red_ids = np.unique(m[10:26, 10:36])
        blue_ids = np.unique(m[40:58, 55:85])
        assert len(red_ids) == 1 and len(blue_ids) == 1
        assert red_ids[0] != blue_ids[0]
        assert (np.load(data / "boundary_mask" / "a.npy") == 1).all()


class TestICP:
    def test_recovers_small_rigid_offset(self):
        from gaussiangrasper_tpu.scripts.generate_data import icp_refine

        rng = np.random.default_rng(0)
        dst = rng.uniform(-1, 1, (2000, 3))
        # small rotation about z + translation
        ang = 0.02
        r = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        t = np.array([0.01, -0.015, 0.02])
        src = dst @ r.T + t
        est = icp_refine(src, dst, iterations=30)
        aligned = src @ est[:3, :3].T + est[:3, 3]
        assert np.abs(aligned - dst).mean() < 5e-3


def test_lpips_gated_cleanly():
    """LPIPS needs pretrained weights (absent in this zero-egress image):
    the metric must report unavailable and return None, not crash."""
    import numpy as np

    from gaussiangrasper_tpu.utils import perceptual

    a = np.zeros((8, 8, 3), np.float32)
    if perceptual.lpips_available():
        d = perceptual.lpips(a, a)
        assert d is not None and d < 1e-6
    else:
        assert perceptual.lpips(a, a) is None
