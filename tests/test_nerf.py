"""NeRF-family stack: rays, encodings, volumetric rendering, and a fit
smoke (both fields overfit a single synthetic view)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.core.rays import (
    generate_rays,
    render_weights,
    sample_along_rays,
    sample_pdf,
)
from gaussiangrasper_tpu.models.encodings import (
    hash_grid_encode,
    init_hash_grid,
    positional_encoding,
)
from gaussiangrasper_tpu.models.nerf import NerfConfig, init_nerf, render_rays


def cam(w=16, h=12):
    return Camera.create(12.0, 12.0, w / 2, h / 2, jnp.eye(4)[:3], w, h)


class TestRays:
    def test_center_ray_points_down_minus_z(self):
        c = cam()
        rb = generate_rays(c, coords=jnp.array([[5, 7]]))  # row≈cy, col≈cx
        d = np.asarray(rb.directions[0])
        assert d[2] < -0.99
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-6)

    def test_rays_shape_full_grid(self):
        rb = generate_rays(cam())
        assert rb.origins.shape == (12, 16, 3)

    def test_weights_sum_to_one_minus_transmittance(self):
        dens = jnp.ones((4, 8, 1)) * 10.0
        deltas = jnp.full((4, 8, 1), 0.1)
        w = render_weights(dens, deltas)
        total = np.asarray(jnp.sum(w, axis=-2))
        np.testing.assert_allclose(total, 1.0 - np.exp(-8.0), atol=1e-5)

    def test_pdf_sampling_concentrates(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(2, 0)
        w = jnp.zeros((2, 8)).at[:, 3].set(1.0)  # all mass in bin [3/8, 4/8]
        t = sample_pdf(bins, w, 64, jax.random.key(0))
        t = np.asarray(t)
        frac = ((t > 3 / 8 - 1e-3) & (t < 4 / 8 + 1e-3)).mean()
        assert frac > 0.9


class TestEncodings:
    def test_positional_shape_and_range(self):
        x = jnp.zeros((5, 3))
        e = positional_encoding(x, 4)
        assert e.shape == (5, 3 + 6 * 4)
        assert float(jnp.abs(e).max()) <= 1.0

    def test_hash_grid_interpolates_continuously(self):
        params = init_hash_grid(jax.random.key(0), num_levels=4,
                                log2_hashmap_size=10, base_res=4, max_res=32)
        a = hash_grid_encode(params, jnp.array([[0.5, 0.5, 0.5]]))
        b = hash_grid_encode(params, jnp.array([[0.5 + 1e-4, 0.5, 0.5]]))
        assert a.shape == (1, 8)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_hash_grid_gradients_flow(self):
        params = init_hash_grid(jax.random.key(1), num_levels=2,
                                log2_hashmap_size=8)
        g = jax.grad(
            lambda p: jnp.sum(hash_grid_encode(p, jnp.ones((3, 3)) * 0.3))
        )(params)
        assert float(jnp.abs(g["table"]).max()) > 0


@pytest.mark.parametrize("field", ["vanilla", "nerfacto"])
def test_nerf_overfits_single_view(field):
    cfg = NerfConfig(field=field, num_coarse=24, num_fine=24, hidden=32,
                     hash_levels=4, log2_hashmap_size=10, far=4.0)
    key = jax.random.key(0)
    params = init_nerf(key, cfg)
    c = cam()
    rb = generate_rays(c)
    flat = jax.tree.map(lambda l: l.reshape(-1, l.shape[-1]), rb)
    # target: a red square in the image center
    target = jnp.zeros((12, 16, 3)).at[4:8, 6:10, 0].set(1.0).reshape(-1, 3)

    opt = optax.adam(5e-3)
    ostate = opt.init(params)

    @jax.jit
    def step(params, ostate, k):
        def loss(p):
            out = render_rays(p, flat, k, cfg)
            return jnp.mean((out["rgb"] - target) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        up, ostate2 = opt.update(g, ostate)
        return optax.apply_updates(params, up), ostate2, l

    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        params, ostate, l = step(params, ostate, sub)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::10]


class TestOccupancy:
    def test_update_and_mask(self):
        from gaussiangrasper_tpu.models.occupancy import (
            init_grid,
            masked_densities,
            occupancy_mask,
            update_grid,
        )

        grid = init_grid([[-1, -1, -1], [1, 1, 1]], resolution=8, threshold=0.5)
        pts = jnp.array([[0.9, 0.9, 0.9], [-0.9, -0.9, -0.9]])
        dens = jnp.array([5.0, 0.1])
        grid = update_grid(grid, pts, dens, ema=0.9)
        m = occupancy_mask(grid, pts)
        assert bool(m[0]) and not bool(m[1])
        # EMA decay eventually clears unobserved cells
        for _ in range(50):
            grid = update_grid(grid, pts[1:], dens[1:], ema=0.5)
        assert not bool(occupancy_mask(grid, pts[:1])[0])
        # masked densities zero out empty space
        d = masked_densities(grid, pts, jnp.ones((2, 1)))
        np.testing.assert_allclose(np.asarray(d[:, 0]), [0.0, 0.0])


class TestCameraTypeRays:
    """Fisheye + equirectangular ray generation (the reference's
    CameraType branches, cameras.py:501-880)."""

    def test_fisheye_center_matches_perspective(self):
        c = cam()
        center = jnp.array([[6, 8]])  # pixel at the principal point
        a = generate_rays(c, coords=center, camera_type="perspective")
        b = generate_rays(c, coords=center, camera_type="fisheye")
        np.testing.assert_allclose(
            np.asarray(a.directions), np.asarray(b.directions), atol=1e-4
        )

    def test_fisheye_90deg_ray(self):
        """A pixel whose normalized-plane radius equals pi/2 maps to a ray
        orthogonal to the optical axis (equidistant model)."""
        c = Camera.create(10.0, 10.0, 8.0, 6.0, jnp.eye(4)[:3], 16, 12)
        # dx = pi/2 at x = cx + fx*pi/2 - 0.5
        x = 8.0 + 10.0 * np.pi / 2 - 0.5
        rb = generate_rays(c, coords=jnp.array([[5.5, x]]),
                           camera_type="fisheye")
        d = np.asarray(rb.directions[0])
        assert abs(d[2]) < 1e-4 and d[0] > 0.99

    def test_equirect_covers_sphere(self):
        c = Camera.create(1.0, 1.0, 8.0, 6.0, jnp.eye(4)[:3], 16, 12)
        rb = generate_rays(c, camera_type="equirectangular")
        d = np.asarray(rb.directions).reshape(-1, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        # both hemispheres reached in every axis
        assert d[:, 0].min() < -0.8 and d[:, 0].max() > 0.8
        assert d[:, 1].min() < -0.8 and d[:, 1].max() > 0.8
        assert d[:, 2].min() < -0.8 and d[:, 2].max() > 0.8
        # image center looks down -z (the forward direction)
        mid = np.asarray(
            generate_rays(c, coords=jnp.array([[6, 8]]),
                          camera_type="equirectangular").directions[0]
        )
        assert mid[2] < -0.95


class TestDynamicBatch:
    """DynamicBatchPipeline analog (engine/dynamic_batch.py; ref
    pipelines/dynamic_batch.py:35-95): constant-live-samples control law
    with power-of-two bucketing for bounded jit recompiles."""

    def test_sizer_converges_to_target(self):
        from gaussiangrasper_tpu.engine.dynamic_batch import DynamicBatchSizer

        s = DynamicBatchSizer(target_num_samples=1 << 18,
                              max_num_samples_per_ray=1 << 10)
        assert s.num_rays == 256  # the reference's init: target // max_spr
        # simulate: occupancy keeps only ~1/16 of the 1024 dense samples,
        # so the measured count is 64 * num_rays — the sizer should grow
        # rays toward target/64 = 4096
        history = [s.num_rays]
        for _ in range(12):
            measured = 64 * s.num_rays
            history.append(s.update(measured))
        assert history[-1] == 4096, history
        # all emitted counts are powers of two (bounded program count)
        assert all(r & (r - 1) == 0 for r in history)
        # and the count adapted away from its initial value and then held
        assert history[0] == 256 and history[1] == 4096
        assert history[-1] == history[1]  # stable once on target

    def test_sizer_clips_and_shrinks(self):
        from gaussiangrasper_tpu.engine.dynamic_batch import DynamicBatchSizer

        s = DynamicBatchSizer(target_num_samples=1 << 14,
                              max_num_samples_per_ray=16,
                              min_rays=128, max_rays=2048)
        # dense scene: every sample lives -> measured = 16*rays
        for _ in range(8):
            s.update(16 * s.num_rays)
        assert s.num_rays == 1024  # 2^14 / 16
        # exploding sample counts shrink to the floor, never below
        for _ in range(8):
            s.update(10_000_000)
        assert s.num_rays == 128
        # dead scene grows to the ceiling, never above
        for _ in range(12):
            s.update(1)
        assert s.num_rays == 2048

    def test_render_reports_live_samples(self):
        from gaussiangrasper_tpu.models import occupancy

        cfg = NerfConfig(field="instant-ngp", num_coarse=8, num_fine=0,
                         hash_levels=2, log2_hashmap_size=8)
        params = init_nerf(jax.random.PRNGKey(0), cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7], [3, 2]]))
        dead = occupancy.init_grid([[-4, -4, -4], [4, 4, 4]], resolution=4)
        out = render_rays(params, rb, jax.random.PRNGKey(1), cfg, grid=dead)
        assert int(out["num_live_samples"]) == 0
        live = dead._replace(density=jnp.full((4, 4, 4), 1.0))
        out = render_rays(params, rb, jax.random.PRNGKey(1), cfg, grid=live)
        assert int(out["num_live_samples"]) == 2 * 8
