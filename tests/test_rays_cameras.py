"""Panoramic/stereo camera-model ray generation + per-ray undistortion +
pixel samplers (ref cameras.py:41 camera types, :640-780 ODS/VR180 rays,
camera_utils.radial_and_tangential_undistort; pixel_samplers.py:291-420)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.core.rays import (
    VR_IPD,
    generate_rays,
    undistort_coords,
)
from gaussiangrasper_tpu.data.pixel_samplers import (
    PairPixelSampler,
    PatchPixelSampler,
    make_pixel_sampler,
)

W, H = 16, 8


def _cam():
    return Camera.create(fx=W / 2, fy=H, cx=W / 2, cy=H / 2,
                         camera_to_world=jnp.eye(4)[:3], width=W, height=H)


class TestStereoCameraModels:
    def test_ods_origins_on_ipd_circle(self):
        rb = generate_rays(_cam(), camera_type="omnidirectional_l")
        radii = np.linalg.norm(np.asarray(rb.origins), axis=-1)
        np.testing.assert_allclose(radii, VR_IPD / 2.0, atol=1e-6)
        # unit directions
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0,
            atol=1e-5,
        )

    def test_ods_left_right_mirror(self):
        left = generate_rays(_cam(), camera_type="omnidirectional_l")
        right = generate_rays(_cam(), camera_type="omnidirectional_r")
        np.testing.assert_allclose(
            np.asarray(left.origins), -np.asarray(right.origins), atol=1e-7
        )
        # same directions regardless of eye
        np.testing.assert_allclose(
            np.asarray(left.directions), np.asarray(right.directions),
            atol=1e-7,
        )

    def test_vr180_fixed_eye_offset(self):
        rb = generate_rays(_cam(), camera_type="vr180_r")
        np.testing.assert_allclose(
            np.asarray(rb.origins),
            np.broadcast_to([VR_IPD / 2, 0, 0], rb.origins.shape),
            atol=1e-7,
        )
        # VR180 spans +-90deg: every direction has z <= small positive
        # (forward hemisphere; forward is -z)
        dirs = np.asarray(rb.directions)
        assert dirs[..., 2].max() < 1e-5

    def test_center_pixel_looks_forward(self):
        for ct in ("omnidirectional_l", "vr180_l"):
            rb = generate_rays(
                _cam(), coords=jnp.array([[H // 2, W // 2]]), camera_type=ct
            )
            d = np.asarray(rb.directions)[0]
            # at image center (after the +0.5 center offset the direction
            # is near-forward): -z dominant
            assert d[2] < -0.9, (ct, d)


class TestUndistortion:
    def test_round_trip(self):
        """distort(undistort(x)) == x for a realistic coefficient set."""
        dist = jnp.array([0.05, -0.01, 0.002, 0.0, 0.001, -0.002])
        k1, k2, k3, k4, p1, p2 = np.asarray(dist)
        rng = np.random.default_rng(0)
        xu = rng.uniform(-0.4, 0.4, 64)
        yu = rng.uniform(-0.3, 0.3, 64)
        r2 = xu * xu + yu * yu
        d = 1 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        xd = d * xu + 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        yd = d * yu + 2 * p2 * xu * yu + p1 * (r2 + 2 * yu * yu)
        xr, yr = undistort_coords(jnp.asarray(xd), jnp.asarray(yd), dist)
        np.testing.assert_allclose(np.asarray(xr), xu, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yr), yu, atol=1e-5)

    def test_rays_shift_with_distortion(self):
        cam = _cam()
        coords = jnp.array([[2, 3]])
        plain = generate_rays(cam, coords=coords)
        dist = generate_rays(cam, coords=coords,
                             distortion=jnp.array([0.1, 0, 0, 0, 0, 0]))
        assert not np.allclose(np.asarray(plain.directions),
                               np.asarray(dist.directions))
        # zero coefficients are a no-op
        zero = generate_rays(cam, coords=coords,
                             distortion=jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(plain.directions),
                                   np.asarray(zero.directions), atol=1e-6)


class TestPixelSamplers:
    def test_patch_blocks_are_contiguous(self):
        s = PatchPixelSampler(rays_per_batch=64, patch_size=4)
        pix = s.sample(np.random.default_rng(0), 32, 48)
        assert pix.shape == (64, 2)
        blocks = pix.reshape(-1, 4, 4, 2)
        for b in blocks:
            # rows constant along axis 1, cols constant along axis 0
            assert (np.diff(b[..., 0], axis=0) == 1).all()
            assert (np.diff(b[..., 1], axis=1) == 1).all()
        assert pix[:, 0].max() < 32 and pix[:, 1].max() < 48

    def test_pair_radius_and_interleave(self):
        s = PairPixelSampler(rays_per_batch=100, radius=3)
        pix = s.sample(np.random.default_rng(1), 40, 40)
        assert pix.shape == (100, 2)
        anchors, mates = pix[0::2], pix[1::2]
        assert np.abs(anchors - mates).max() <= 3

    def test_factory(self):
        assert make_pixel_sampler("uniform", 8).sample(
            np.random.default_rng(0), 4, 4).shape == (8, 2)
        with pytest.raises(KeyError, match="unknown pixel sampler"):
            make_pixel_sampler("nope", 8)

    def test_nerf_trainer_accepts_sampler_config(self, tmp_path):
        """The patch sampler drives a short nerf training run end to end."""
        import json

        from PIL import Image

        data = tmp_path / "scene"
        (data / "images").mkdir(parents=True)
        rng = np.random.default_rng(0)
        frames = []
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            ).save(data / "images" / f"f{i}.png")
            pose = np.eye(4)
            pose[0, 3] = 0.05 * i
            frames.append({"file_path": f"images/f{i}.png",
                           "transform_matrix": pose.tolist()})
        (data / "transforms.json").write_text(json.dumps(
            {"fl_x": 25.0, "fl_y": 25.0, "cx": 16, "cy": 12,
             "w": 32, "h": 24, "frames": frames}))

        from gaussiangrasper_tpu.data.dataparsers.zoo import resolve_parser
        from gaussiangrasper_tpu.data.manager import (
            FullImageDatamanager, SamplerConfig,
        )
        from gaussiangrasper_tpu.engine.nerf_trainer import (
            NerfTrainer, NerfTrainerConfig,
        )
        from gaussiangrasper_tpu.models.nerf import NerfConfig

        dm = FullImageDatamanager(resolve_parser(data).parse(),
                                  SamplerConfig(), seed=0)
        cfg = NerfTrainerConfig(
            data=data, output_dir=tmp_path / "out",
            experiment_name="patch", max_iterations=2, steps_per_save=2,
            rays_per_batch=32, pixel_sampler="patch", patch_size=4,
            model=NerfConfig(num_coarse=4, num_fine=4, hidden=8),
        )
        trainer = NerfTrainer(cfg, dm)
        trainer.setup()
        trainer.train()
