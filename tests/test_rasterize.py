"""Rasterizer correctness: tiled pipeline vs the brute-force oracle.

This is BASELINE.md config 1 scaled for CI: random Gaussians, RGB render +
backward on CPU, forward image AND parameter gradients allclose between the
tile-based pipeline and the O(N*P) per-pixel oracle. Also finite-difference
gradient checks on a tiny scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiangrasper_tpu.core.cameras import Camera, view_matrix
from gaussiangrasper_tpu.ops.oracle import render_oracle
from gaussiangrasper_tpu.ops.projection import project_gaussians
from gaussiangrasper_tpu.ops.rasterize import (
    RasterizeConfig,
    bin_gaussians,
    rasterize,
    rasterize_projected,
)


def make_scene(key, n, width=128, height=96, n_channels=3):
    """Random Gaussians in front of a camera at the origin looking down -z
    (OpenGL), i.e. +z in the rasterizer frame is at world -z."""
    keys = jax.random.split(key, 6)
    means = jnp.concatenate(
        [
            jax.random.uniform(keys[0], (n, 2), minval=-1.5, maxval=1.5),
            -jax.random.uniform(keys[1], (n, 1), minval=2.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = jnp.exp(jax.random.uniform(keys[2], (n, 3), minval=-4.5, maxval=-2.5))
    quats = jax.random.normal(keys[3], (n, 4))
    opacities = jax.nn.sigmoid(jax.random.normal(keys[4], (n,)))
    colors = jax.random.uniform(keys[5], (n, n_channels))
    c2w = jnp.eye(4)[:3]
    cam = Camera.create(
        fx=0.6 * width, fy=0.6 * width, cx=width / 2, cy=height / 2,
        camera_to_world=c2w, width=width, height=height,
    )
    return dict(
        means=means, scales=scales, quats=quats, opacities=opacities,
        colors=colors, cam=cam,
    )


def project_scene(scene):
    cam = scene["cam"]
    vm = view_matrix(cam.camera_to_world)
    return project_gaussians(
        scene["means"], scene["scales"], scene["quats"], vm,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )


class TestBinning:
    def test_counts_match_rectangles(self):
        scene = make_scene(jax.random.key(0), 500)
        proj = project_scene(scene)
        cfg = RasterizeConfig(max_gaussians_per_tile=500)
        bins = bin_gaussians(proj, scene["cam"].width, scene["cam"].height, cfg)
        assert int(bins.overflow) == 0
        # every valid entry points at an alive gaussian
        gidx = np.asarray(bins.tile_gidx)
        radii = np.asarray(proj.radii)
        valid = gidx >= 0
        assert (radii[gidx[valid]] > 0).all()
        # total list entries == total tiles hit
        assert valid.sum() == int(np.asarray(bins.num_tiles_hit).sum())

    def test_depth_ordered_within_tile(self):
        scene = make_scene(jax.random.key(1), 300)
        proj = project_scene(scene)
        cfg = RasterizeConfig(max_gaussians_per_tile=300)
        bins = bin_gaussians(proj, scene["cam"].width, scene["cam"].height, cfg)
        gidx = np.asarray(bins.tile_gidx)
        depths = np.asarray(proj.depths)
        for t in range(gidx.shape[0]):
            row = gidx[t][gidx[t] >= 0]
            d = depths[row]
            assert (np.diff(d) >= 0).all()

    def test_max_tiles_per_gaussian_cap(self):
        scene = make_scene(jax.random.key(2), 100)
        proj = project_scene(scene)
        cfg = RasterizeConfig(max_tiles_per_gaussian=4)
        bins = bin_gaussians(proj, scene["cam"].width, scene["cam"].height, cfg)
        assert int(np.asarray(bins.num_tiles_hit).max()) <= 4

    def test_equal_depth_ties_keep_index_order(self):
        """The two-key pair sort must break equal-depth ties by original
        index — the stable-argsort semantics the oracle uses."""
        scene = make_scene(jax.random.key(8), 6)
        # co-locate all six at identical depth, overlapping the center
        scene["means"] = (
            jnp.tile(jnp.array([0.0, 0.0, -3.0]), (6, 1))
            + jnp.arange(6)[:, None] * jnp.array([0.01, 0.0, 0.0])
        )
        proj = project_scene(scene)
        np.testing.assert_allclose(np.asarray(proj.depths), 3.0, atol=1e-6)
        cfg = RasterizeConfig(max_gaussians_per_tile=6)
        bins = bin_gaussians(proj, scene["cam"].width, scene["cam"].height, cfg)
        gidx = np.asarray(bins.tile_gidx)
        for row in gidx:
            vals = row[row >= 0]
            assert (np.diff(vals) > 0).all(), vals


class TestForwardVsOracle:
    @pytest.mark.parametrize("n,channels", [(2000, 3), (500, 39)])
    def test_allclose(self, n, channels):
        scene = make_scene(jax.random.key(3), n, n_channels=channels)
        proj = project_scene(scene)
        bg = jnp.linspace(0.0, 1.0, channels)
        cfg = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=16)
        out = rasterize_projected(
            proj, scene["colors"], scene["opacities"], bg,
            scene["cam"].width, scene["cam"].height, cfg,
        )
        oracle = render_oracle(
            proj, scene["colors"], scene["opacities"], bg,
            scene["cam"].width, scene["cam"].height,
        )
        np.testing.assert_allclose(out["image"], oracle, atol=2e-5, rtol=1e-4)

    def test_empty_scene_is_background(self):
        scene = make_scene(jax.random.key(4), 10)
        # push everything behind the camera
        scene["means"] = scene["means"].at[:, 2].set(5.0)
        bg = jnp.array([0.2, 0.4, 0.6])
        out = rasterize(
            scene["means"], scene["scales"], scene["quats"],
            scene["opacities"], scene["colors"],
            view_matrix(scene["cam"].camera_to_world),
            scene["cam"].fx, scene["cam"].fy, scene["cam"].cx, scene["cam"].cy,
            scene["cam"].width, scene["cam"].height, bg,
        )
        np.testing.assert_allclose(
            out["image"], jnp.broadcast_to(bg, out["image"].shape), atol=1e-6
        )
        assert float(out["alpha"].max()) == 0.0

    def test_mask_culls(self):
        scene = make_scene(jax.random.key(5), 50)
        cam = scene["cam"]
        vm = view_matrix(cam.camera_to_world)
        common = (scene["opacities"], scene["colors"], vm, cam.fx, cam.fy,
                  cam.cx, cam.cy, cam.width, cam.height)

        def render(mask):
            return rasterize(
                scene["means"], scene["scales"], scene["quats"], *common,
                mask=mask,
            )["image"]

        full = render(jnp.ones(50, bool))
        half_mask = jnp.arange(50) < 25
        half = render(half_mask)
        # rendering with the first 25 only == rendering first-25 arrays
        sub = rasterize(
            scene["means"][:25], scene["scales"][:25], scene["quats"][:25],
            scene["opacities"][:25], scene["colors"][:25], vm,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        )["image"]
        np.testing.assert_allclose(half, sub, atol=1e-6)
        assert not np.allclose(full, half)


class TestGradients:
    def _loss_fns(self, scene, use_oracle):
        cam = scene["cam"]
        vm = view_matrix(cam.camera_to_world)
        bg = jnp.zeros(scene["colors"].shape[-1])
        target = jnp.zeros((cam.height, cam.width, scene["colors"].shape[-1]))
        cfg = RasterizeConfig(
            max_gaussians_per_tile=scene["means"].shape[0], tile_chunk=8
        )

        def loss(params):
            proj = project_gaussians(
                params["means"], jnp.exp(params["log_scales"]), params["quats"],
                vm, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            )
            opac = jax.nn.sigmoid(params["opacity_logits"])
            if use_oracle:
                img = render_oracle(
                    proj, params["colors"], opac, bg, cam.width, cam.height
                )
            else:
                img = rasterize_projected(
                    proj, params["colors"], opac, bg, cam.width, cam.height, cfg
                )["image"]
            return jnp.mean((img - target) ** 2)

        return loss

    def test_grads_match_oracle(self):
        scene = make_scene(jax.random.key(6), 400, width=64, height=64)
        params = {
            "means": scene["means"],
            "log_scales": jnp.log(scene["scales"]),
            "quats": scene["quats"],
            "opacity_logits": jax.scipy.special.logit(scene["opacities"]),
            "colors": scene["colors"],
        }
        g_tiled = jax.grad(self._loss_fns(scene, use_oracle=False))(params)
        g_oracle = jax.grad(self._loss_fns(scene, use_oracle=True))(params)
        for k in params:
            np.testing.assert_allclose(
                g_tiled[k], g_oracle[k], atol=1e-6, rtol=2e-3, err_msg=k
            )

    def test_finite_differences(self):
        scene = make_scene(jax.random.key(7), 20, width=32, height=32)
        params = {
            "means": scene["means"],
            "log_scales": jnp.log(scene["scales"]),
            "quats": scene["quats"],
            "opacity_logits": jax.scipy.special.logit(scene["opacities"]),
            "colors": scene["colors"],
        }
        loss = self._loss_fns(scene, use_oracle=False)
        g = jax.grad(loss)(params)
        # probe a few random directions per leaf with central differences
        key = jax.random.key(8)
        eps = 1e-3
        for k in ["means", "colors", "opacity_logits"]:
            key, sub = jax.random.split(key)
            direction = jax.random.normal(sub, params[k].shape)
            direction = direction / jnp.linalg.norm(direction)
            p_plus = dict(params, **{k: params[k] + eps * direction})
            p_minus = dict(params, **{k: params[k] - eps * direction})
            fd = (loss(p_plus) - loss(p_minus)) / (2 * eps)
            analytic = jnp.vdot(g[k], direction)
            np.testing.assert_allclose(analytic, fd, atol=3e-5, rtol=3e-2)


class TestBackendAgreement:
    """The work-proportional custom-VJP backend ("xla", default) against
    the always-full-K autodiff scan backend ("xla_scan"): images and
    parameter gradients must agree — the scan path has no hand-written
    gradient code, so this cross-checks the reverse-walk VJP."""

    def test_images_and_grads_match_scan_backend(self):
        scene = make_scene(jax.random.key(11), 400, width=80, height=64)
        cam = scene["cam"]
        vm = view_matrix(cam.camera_to_world)
        target = jax.random.uniform(jax.random.key(3), (64, 80, 3))

        def run(backend):
            cfg = RasterizeConfig(backend=backend, tile_chunk=5)

            def loss(means, scales, quats, opac, colors):
                out = rasterize(
                    means, scales, quats, opac, colors, vm,
                    cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                    config=cfg,
                )
                return jnp.mean(jnp.abs(out["image"] - target)), out["image"]

            (l, img), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                                 has_aux=True)(
                scene["means"], scene["scales"], scene["quats"],
                scene["opacities"], scene["colors"],
            )
            return img, grads

        img_a, g_a = run("xla")
        img_b, g_b = run("xla_scan")
        np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                                   atol=1e-5)
        for a, b in zip(g_a, g_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)
