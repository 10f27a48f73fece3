"""Model-zoo parity: every NeRF-family field variant renders, differentiates,
and (for the cheap ones) overfits; variant-specific mechanisms behave
(IPE damping, occupancy skipping, VM factor locality, NeuS alphas,
deformation identity-at-init, semantic/appearance heads).

Mirrors the reference's per-method smoke strategy
(/root/reference/tests/test_train.py: every registered method for 2 steps
on CPU) plus component units the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.core.rays import generate_rays
from gaussiangrasper_tpu.models import mip, occupancy
from gaussiangrasper_tpu.models.nerf import NerfConfig, init_nerf, render_rays
from gaussiangrasper_tpu.models.sdf_field import (
    alphas_to_weights,
    neus_alphas,
)
from gaussiangrasper_tpu.models.tensorf_field import (
    init_tensorf,
    tensorf_density,
    tensorf_l1_reg,
    tensorf_rgb,
)


def cam(w=16, h=12):
    return Camera.create(12.0, 12.0, w / 2, h / 2, jnp.eye(4)[:3], w, h)


def tiny_cfg(field, **kw):
    defaults = dict(
        field=field, num_coarse=8, num_fine=8, hidden=16,
        hash_levels=4, log2_hashmap_size=8, tensorf_resolution=16, far=4.0,
    )
    defaults.update(kw)
    return NerfConfig(**defaults)


ALL_FIELDS = [
    "vanilla", "nerfacto", "mipnerf", "instant-ngp", "tensorf",
    "neus", "neus-facto",
]


@pytest.mark.parametrize("field", ALL_FIELDS)
def test_every_field_renders_and_differentiates(field):
    cfg = tiny_cfg(field)
    key = jax.random.key(0)
    params = init_nerf(key, cfg)
    rb = generate_rays(cam(), coords=jnp.array([[3, 4], [5, 6], [7, 8]]))
    out = render_rays(params, rb, key, cfg)
    assert out["rgb"].shape == (3, 3)
    assert out["depth"].shape == (3, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    g = jax.grad(
        lambda p: jnp.sum(render_rays(p, rb, key, cfg)["rgb"])
    )(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least one parameter group receives signal
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestMip:
    def test_frustum_gaussian_matches_point_limit(self):
        """As the frustum shrinks, the Gaussian mean -> the midpoint and
        the covariance -> 0."""
        o = jnp.zeros((1, 3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        means, cov = mip.conical_frustum_to_gaussian(
            o, d, jnp.array([[1.0]]), jnp.array([[1.0 + 1e-5]]),
            jnp.array([[1e-6]]),
        )
        np.testing.assert_allclose(
            np.asarray(means[0, 0]), [0, 0, 1.0], atol=1e-4
        )
        assert float(jnp.abs(cov).max()) < 1e-8

    def test_ipe_damps_high_frequencies(self):
        """Large variance kills high-frequency components while a point
        (zero variance) reproduces plain sin/cos."""
        m = jnp.array([[0.3, -0.2, 0.7]])
        zero = jnp.zeros((1, 3))
        big = jnp.ones((1, 3)) * 100.0
        e0 = mip.integrated_pos_enc(m, zero, 4)
        eb = mip.integrated_pos_enc(m, big, 4)
        # zero-cov IPE == exact sin/cos of scaled coords
        freqs = 2.0 ** jnp.arange(4)
        ref = jnp.concatenate(
            [jnp.sin(m[..., None] * freqs), jnp.cos(m[..., None] * freqs)], -1
        ).reshape(1, -1)
        np.testing.assert_allclose(np.asarray(e0), np.asarray(ref), atol=1e-6)
        assert float(jnp.abs(eb).max()) < 1e-3

    def test_fine_pass_improves_with_training_signal(self):
        cfg = tiny_cfg("mipnerf", num_coarse=16, num_fine=16)
        key = jax.random.key(1)
        params = init_nerf(key, cfg)
        rb = generate_rays(cam())
        flat = jax.tree.map(lambda l: l.reshape(-1, l.shape[-1]), rb)
        target = jnp.zeros((12 * 16, 3)).at[:, 0].set(0.8)
        opt = optax.adam(5e-3)
        ostate = opt.init(params)

        @jax.jit
        def step(p, o, k):
            def loss(p):
                out = render_rays(p, flat, k, cfg)
                return (
                    jnp.mean((out["rgb"] - target) ** 2)
                    + 0.1 * jnp.mean((out["rgb_coarse"] - target) ** 2)
                )

            l, g = jax.value_and_grad(loss)(p)
            up, o2 = opt.update(g, o)
            return optax.apply_updates(p, up), o2, l

        losses = []
        for _ in range(40):
            key, sub = jax.random.split(key)
            params, ostate, l = step(params, ostate, sub)
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses[::10]


class TestInstantNGP:
    def test_occupancy_grid_zeroes_empty_space(self):
        cfg = tiny_cfg("instant-ngp")
        key = jax.random.key(0)
        params = init_nerf(key, cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7]]))
        s = cfg.scene_scale
        # a grid that is entirely empty -> zero accumulation
        grid = occupancy.init_grid(
            [[-s, -s, -s], [s, s, s]], resolution=8, threshold=0.5
        )
        out = render_rays(params, rb, key, cfg, grid=grid)
        np.testing.assert_allclose(np.asarray(out["accumulation"]), 0.0, atol=1e-6)
        # without the grid the field does produce some density
        out2 = render_rays(params, rb, key, cfg)
        assert float(out2["accumulation"][0, 0]) > 0

    def test_trainer_grid_update_marks_dense_cells(self):
        from gaussiangrasper_tpu.engine.nerf_trainer import _grid_update

        cfg = tiny_cfg("instant-ngp")
        params = init_nerf(jax.random.key(0), cfg)
        s = cfg.scene_scale
        grid = occupancy.init_grid(
            [[-s, -s, -s], [s, s, s]], resolution=8, threshold=1e9
        )
        grid2 = _grid_update(grid, params, jax.random.key(1), cfg)
        assert float(grid2.density.max()) > 0


class TestTensorf:
    def test_density_is_local_to_factors(self):
        params = init_tensorf(jax.random.key(0), resolution=8,
                              density_components=2, appearance_components=4)
        # zero all density factors -> uniform (softplus(-5)) baseline
        z = {**params,
             "density_planes": jnp.zeros_like(params["density_planes"]),
             "density_lines": jnp.zeros_like(params["density_lines"])}
        x = jax.random.uniform(jax.random.key(1), (32, 3))
        base = tensorf_density(z, x)
        np.testing.assert_allclose(
            np.asarray(base), float(jax.nn.softplus(-5.0)), atol=1e-6
        )
        # a spike at one plane/line cell only lifts density near that cell
        zp = z["density_planes"].at[0, 4, 4, :].set(50.0)
        zl = z["density_lines"].at[0, 4, :].set(1.0)
        spiked = {**z, "density_planes": zp, "density_lines": zl}
        near = tensorf_density(spiked, jnp.array([[4 / 7, 4 / 7, 4 / 7]]))
        far = tensorf_density(spiked, jnp.array([[0.05, 0.05, 0.05]]))
        assert float(near[0, 0]) > 10 * float(far[0, 0])

    def test_rgb_in_range_and_reg_positive(self):
        params = init_tensorf(jax.random.key(0), resolution=8)
        x = jax.random.uniform(jax.random.key(1), (16, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        rgb = tensorf_rgb(params, x, d)
        assert rgb.shape == (16, 3)
        assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
        assert float(tensorf_l1_reg(params)) > 0


class TestNeus:
    def test_alpha_peaks_at_zero_crossing(self):
        """A ray crossing sdf + -> - gets alpha concentrated at the
        crossing sample."""
        S = 16
        t = jnp.linspace(0.0, 2.0, S)
        sdf = (1.0 - t)[None, :, None]  # crossing at t=1
        grad = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (1, S, 1))
        dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (1, S, 1))
        deltas = jnp.full((1, S, 1), 2.0 / S)
        a = neus_alphas(sdf, grad, dirs, deltas, jnp.asarray(50.0))
        w = alphas_to_weights(a)
        peak = int(jnp.argmax(w[0, :, 0]))
        assert abs(peak - S // 2) <= 1
        # weights are a valid distribution
        assert float(jnp.sum(w)) <= 1.0 + 1e-5

    def test_eikonal_at_init_is_reasonable(self):
        cfg = tiny_cfg("neus")
        params = init_nerf(jax.random.key(0), cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7]]))
        out = render_rays(params, rb, jax.random.key(0), cfg)
        assert np.isfinite(float(out["eikonal"].mean()))
        # normals are unit-ish where accumulated
        n = np.asarray(out["normal"][0])
        assert np.isfinite(n).all()


class TestVariants:
    def test_deformation_is_identity_at_init(self):
        """dnerf warp MLP is zero-initialized: rendering must equal the
        undeformed vanilla field at init for any time."""
        cfg_d = tiny_cfg("vanilla", deformation=True)
        cfg_v = tiny_cfg("vanilla")
        key = jax.random.key(0)
        p = init_nerf(key, cfg_d)
        p_v = {k: v for k, v in p.items() if k != "deform_mlp"}
        rb = generate_rays(cam(), coords=jnp.array([[5, 7], [2, 3]]))
        a = render_rays(p, rb, jax.random.key(5), cfg_d, times=jnp.asarray(0.7))
        b = render_rays(p_v, rb, jax.random.key(5), cfg_v)
        np.testing.assert_allclose(
            np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-6
        )

    @pytest.mark.slow
    def test_deformation_gradient_reaches_warp(self):
        cfg = tiny_cfg("vanilla", deformation=True)
        p = init_nerf(jax.random.key(0), cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7]]))
        g = jax.grad(
            lambda p: jnp.sum(
                render_rays(p, rb, jax.random.key(0), cfg,
                            times=jnp.asarray(0.3))["rgb"]
            )
        )(p)
        # the warp's last layer is zero-initialized, so the first gradient
        # lands there (earlier layers unblock after the first update)
        last = len(g["deform_mlp"]) // 2 - 1
        assert float(jnp.abs(g["deform_mlp"][f"w{last}"]).max()) > 0

    def test_semantic_head_shapes_and_detached_weights(self):
        cfg = tiny_cfg("nerfacto", num_semantic_classes=7)
        p = init_nerf(jax.random.key(0), cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7], [1, 2]]))
        out = render_rays(p, rb, jax.random.key(0), cfg)
        assert out["semantics"].shape == (2, 7)
        # the semantic head trains (and, per the semantic-nerfw design,
        # compositing weights are detached: zeroing the semantic MLP's
        # gradient path must leave the rgb gradients untouched)
        g = jax.grad(
            lambda p: jnp.sum(
                render_rays(p, rb, jax.random.key(0), cfg)["semantics"]
            )
        )(p)
        assert float(jnp.abs(g["semantic_mlp"]["w0"]).max()) > 0
        # detached weights: the density->weights path contributes nothing,
        # so grads reach density params only through the geo features of
        # the sampled points (identical samples => finite, no NaN)
        assert np.isfinite(np.asarray(g["density_mlp"]["w0"])).all()

    def test_appearance_embeddings_change_color_only(self):
        cfg = tiny_cfg("nerfacto", num_appearance_embeds=4)
        p = init_nerf(jax.random.key(0), cfg)
        rb = generate_rays(cam(), coords=jnp.array([[5, 7]]))
        a = render_rays(p, rb, jax.random.key(0), cfg,
                        appearance_idx=jnp.asarray(0))
        b = render_rays(p, rb, jax.random.key(0), cfg,
                        appearance_idx=jnp.asarray(2))
        assert not np.allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
        np.testing.assert_allclose(
            np.asarray(a["depth"]), np.asarray(b["depth"]), atol=1e-6
        )


class TestRegistry:
    def test_all_reference_methods_registered(self):
        from gaussiangrasper_tpu.configs.methods import METHODS

        expected = {
            "gaussian-splatting", "nerfacto", "nerfacto-big", "nerfacto-huge",
            "depth-nerfacto", "vanilla-nerf", "mipnerf", "instant-ngp",
            "instant-ngp-bounded", "tensorf", "dnerf", "semantic-nerfw",
            "phototourism", "neus", "neus-facto", "generfacto",
        }
        assert expected <= set(METHODS)

    def test_generfacto_is_gated_with_hint(self):
        from gaussiangrasper_tpu.configs.methods import METHODS

        with pytest.raises(SystemExit, match="diffusion"):
            METHODS["generfacto"](None)


class TestProposal:
    """Proposal-network sampling (the real nerfacto sampler) + its losses
    (ref ProposalNetworkSampler, model_components/losses.py interlevel /
    distortion)."""

    def test_outer_weights_envelope(self):
        from gaussiangrasper_tpu.models.proposal import outer_weights

        t_env = jnp.array([[0.0, 1.0, 2.0, 3.0]])
        w_env = jnp.array([[0.1, 0.6, 0.3]])
        # query interval [0.5, 2.5] overlaps all three bins
        t = jnp.array([[0.5, 2.5]])
        w = outer_weights(t_env, w_env, t)
        np.testing.assert_allclose(np.asarray(w), [[1.0]], atol=1e-6)
        # interval inside one bin gets that bin only
        t = jnp.array([[1.2, 1.8]])
        np.testing.assert_allclose(
            np.asarray(outer_weights(t_env, w_env, t)), [[0.6]], atol=1e-6
        )

    def test_interlevel_zero_when_bounded(self):
        from gaussiangrasper_tpu.models.proposal import interlevel_loss

        t = jnp.array([[0.0, 1.0, 2.0]])
        w = jnp.array([[0.2, 0.3]])
        hists = [(t, jnp.array([[0.5, 0.5]]))]  # envelope >= final
        assert float(interlevel_loss(hists, t, w)) < 1e-9
        hists = [(t, jnp.array([[0.0, 0.0]]))]  # envelope too small
        assert float(interlevel_loss(hists, t, w)) > 1e-3

    def test_distortion_prefers_concentration(self):
        from gaussiangrasper_tpu.models.proposal import distortion_loss

        t = jnp.linspace(0.0, 1.0, 9)[None]
        concentrated = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        spread = jnp.full((1, 8), 1.0 / 8)
        assert float(distortion_loss(t, concentrated, 0.0, 1.0)) < float(
            distortion_loss(t, spread, 0.0, 1.0)
        )

    def test_proposal_render_and_grads(self):
        cfg = tiny_cfg("nerfacto", use_proposal=True,
                       num_proposal_samples=(16, 8),
                       proposal_hash_levels=2,
                       proposal_log2_hashmap_size=6)
        params = init_nerf(jax.random.key(0), cfg)
        assert "proposal_0" in params and "proposal_1" in params
        rb = generate_rays(cam(), coords=jnp.array([[3, 4], [5, 6]]))
        out = render_rays(params, rb, jax.random.key(0), cfg)
        assert out["rgb"].shape == (2, 3)
        assert float(out["interlevel"][0]) >= 0
        assert float(out["distortion"][0]) >= 0

        def loss(p):
            o = render_rays(p, rb, jax.random.key(0), cfg)
            return (jnp.sum(o["rgb"]) + jnp.mean(o["interlevel"])
                    + 0.002 * jnp.mean(o["distortion"]))

        g = jax.grad(loss)(params)
        # proposal grids train through the interlevel loss
        assert float(jnp.abs(g["proposal_0"]["grid"]["table"]).max()) > 0
        assert float(jnp.abs(g["grid"]["table"]).max()) > 0


@pytest.mark.slow
class TestQualityRegression:
    def test_psnr_climbs_at_density(self):
        """Quality-at-scale guard (round-3): from-scratch training at the
        bench DENSITY (12.5k Gaussians @ 200x200, the 200k/800x800 point
        scaled by area) must climb >= +3 dB in 120 steps. This is the gate
        that caught the TPU bf16-SSIM cancellation bug — a perf change
        that silently breaks optimization at scale fails here while every
        small oracle test still passes. Full-scale TPU curve:
        scripts_dev/quality_probe.py (docs/ROUND_NOTES.md)."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).parent.parent
        r = subprocess.run(
            [sys.executable, str(repo / "scripts_dev" / "quality_probe.py"),
             "--n", "12500", "--wh", "200", "--steps", "120", "--views",
             "4", "--log-every", "40"],
            capture_output=True, text=True, timeout=1500,
            env={**__import__("os").environ, "GGT_PLATFORM": "cpu"},
        )
        assert "QUALITY OK" in r.stdout, r.stdout[-2000:] + r.stderr[-500:]


@pytest.mark.slow
class TestPrecisionAB:
    def test_default_precision_tracks_highest(self):
        """Standing precision gate (round-4, VERDICT #3): the same seeded
        training trajectory at the platform's DEFAULT matmul precision
        must stay within scripts_dev/quality_gate.PSNR_BAND (1.0 dB) of
        the all-HIGHEST run. This automates what caught the round-3 bf16
        SSIM cancellation (a 14 dB gap at full scale): any stage that
        loses a cancellation to the TPU's bf16 passes drags the default
        curve down while the HIGHEST curve stays healthy. On CPU both
        trajectories are f32 and identical, so the assertion is exercised
        for real on the TPU nightly profile; the gate also runs at full
        scale each round via scripts_dev/quality_gate.py."""
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).parent.parent
        r = subprocess.run(
            [sys.executable, str(repo / "scripts_dev" / "quality_gate.py"),
             "--n", "8000", "--wh", "160", "--steps", "60", "--views",
             "2", "--log-every", "20", "--no-tabletop"],
            capture_output=True, text=True, timeout=1500,
            env=__import__("os").environ.copy(),
        )
        assert "QUALITY GATE OK" in r.stdout, (
            r.stdout[-2000:] + r.stderr[-500:]
        )
