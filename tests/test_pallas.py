"""Pallas compositing kernels vs the XLA path and the oracle.

Runs in interpreter mode on CPU (same kernel code that compiles on TPU).
Forward images AND custom-VJP gradients must match the autodiff'd XLA
pipeline allclose — this is the kernel-level contract from BASELINE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussiangrasper_tpu.ops.oracle import render_oracle
from gaussiangrasper_tpu.ops.projection import project_gaussians
from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig, rasterize_projected
from tests.test_rasterize import make_scene, project_scene

W, H = 64, 48


def cfgs(n):
    xla = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8, backend="xla")
    pls = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8, backend="pallas")
    return xla, pls


@pytest.mark.parametrize("channels", [3, 39])
def test_forward_matches_xla(channels):
    n = 300
    scene = make_scene(jax.random.key(10), n, width=W, height=H, n_channels=channels)
    proj = project_scene(scene)
    bg = jnp.linspace(0.1, 0.9, channels)
    xla_cfg, pl_cfg = cfgs(n)
    ref = rasterize_projected(
        proj, scene["colors"], scene["opacities"], bg, W, H, xla_cfg
    )
    out = rasterize_projected(
        proj, scene["colors"], scene["opacities"], bg, W, H, pl_cfg
    )
    np.testing.assert_allclose(out["image"], ref["image"], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(out["alpha"], ref["alpha"], atol=1e-5, rtol=1e-4)


def test_forward_matches_oracle():
    n = 200
    scene = make_scene(jax.random.key(11), n, width=W, height=H)
    proj = project_scene(scene)
    bg = jnp.zeros(3)
    _, pl_cfg = cfgs(n)
    out = rasterize_projected(
        proj, scene["colors"], scene["opacities"], bg, W, H, pl_cfg
    )
    oracle = render_oracle(proj, scene["colors"], scene["opacities"], bg, W, H)
    np.testing.assert_allclose(out["image"], oracle, atol=2e-5, rtol=1e-4)


def test_grads_match_xla():
    n = 150
    scene = make_scene(jax.random.key(12), n, width=W, height=H)
    cam = scene["cam"]
    from gaussiangrasper_tpu.core.cameras import view_matrix

    vm = view_matrix(cam.camera_to_world)
    target = jnp.zeros((H, W, 3))
    xla_cfg, pl_cfg = cfgs(n)

    def loss(params, cfg):
        proj = project_gaussians(
            params["means"], jnp.exp(params["log_scales"]), params["quats"],
            vm, cam.fx, cam.fy, cam.cx, cam.cy, W, H,
        )
        out = rasterize_projected(
            proj, params["colors"], jax.nn.sigmoid(params["opacity_logits"]),
            jnp.zeros(3), W, H, cfg,
        )
        # involve both image and alpha outputs in the loss
        return jnp.mean((out["image"] - target) ** 2) + 0.1 * jnp.mean(out["alpha"])

    params = {
        "means": scene["means"],
        "log_scales": jnp.log(scene["scales"]),
        "quats": scene["quats"],
        "opacity_logits": jax.scipy.special.logit(scene["opacities"]),
        "colors": scene["colors"],
    }
    g_ref = jax.grad(lambda p: loss(p, xla_cfg))(params)
    g_pl = jax.grad(lambda p: loss(p, pl_cfg))(params)
    for k in params:
        np.testing.assert_allclose(g_pl[k], g_ref[k], atol=2e-6, rtol=2e-3, err_msg=k)


def test_empty_tiles_and_zero_counts():
    # all gaussians behind the camera -> every tile empty
    scene = make_scene(jax.random.key(13), 20, width=W, height=H)
    scene["means"] = scene["means"].at[:, 2].set(5.0)
    proj = project_scene(scene)
    bg = jnp.array([0.3, 0.5, 0.7])
    _, pl_cfg = cfgs(20)
    out = rasterize_projected(
        proj, scene["colors"], scene["opacities"], bg, W, H, pl_cfg
    )
    np.testing.assert_allclose(
        out["image"], jnp.broadcast_to(bg, out["image"].shape), atol=1e-6
    )
    assert float(out["alpha"].max()) == 0.0


def test_saturated_transmittance_cut():
    """Many opaque gaussians stacked on one spot: the transmittance cut
    must engage identically in oracle / XLA slab scan / pallas (a
    re-crossing bug here once produced ghost contributions from occluded
    gaussians)."""
    n = 400
    key = jax.random.key(42)
    ks = jax.random.split(key, 3)
    # all gaussians piled near the image center, nearly opaque
    means = jnp.concatenate(
        [jax.random.normal(ks[0], (n, 2)) * 0.05, -2.0 - jax.random.uniform(ks[1], (n, 1)) * 2.0],
        axis=-1,
    )
    scales = jnp.full((n, 3), 0.08)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.95)
    colors = jax.random.uniform(ks[2], (n, 3))
    from gaussiangrasper_tpu.core.cameras import Camera, view_matrix
    from gaussiangrasper_tpu.ops.projection import project_gaussians

    cam = Camera.create(0.6 * W, 0.6 * W, W / 2, H / 2, jnp.eye(4)[:3], W, H)
    proj = project_gaussians(
        means, scales, quats, view_matrix(cam.camera_to_world),
        cam.fx, cam.fy, cam.cx, cam.cy, W, H,
    )
    bg = jnp.array([0.1, 0.2, 0.3])
    xla_cfg, pl_cfg = cfgs(n)
    ref = rasterize_projected(proj, colors, opac, bg, W, H, xla_cfg)
    out = rasterize_projected(proj, colors, opac, bg, W, H, pl_cfg)
    oracle = render_oracle(proj, colors, opac, bg, W, H)
    # the cut actually engages (alpha saturates at the pile)
    assert float(ref["alpha"].max()) > 1.0 - 2e-4
    np.testing.assert_allclose(ref["image"], oracle, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out["image"], oracle, atol=2e-5, rtol=1e-4)


def test_pair_stream_budget_and_overflow():
    """Pair-stream marshaling (v3) budget contract: when the static stream
    budget B = T*K holds every valid pair, the render matches the XLA
    table path exactly and pair_overflow is 0; when per-tile counts
    overflow K so hard that B truncates the stream, the drop is REPORTED
    (cap-and-report, like the other binning caps), never silent."""
    from gaussiangrasper_tpu.ops.rasterize import bin_gaussians

    n = 200
    scene = make_scene(jax.random.key(3), n, width=W, height=H, n_channels=4)
    proj = project_scene(scene)
    bg = jnp.zeros(4)

    # Budget holds (K = n): exact match vs the XLA walk + zero overflow.
    ok_x, ok_p = cfgs(n)  # cfgs returns (xla, pallas)
    out_p = rasterize_projected(proj, scene["colors"], scene["opacities"],
                                bg, W, H, ok_p)
    out_x = rasterize_projected(proj, scene["colors"], scene["opacities"],
                                bg, W, H, ok_x)
    np.testing.assert_allclose(np.asarray(out_p["image"]),
                               np.asarray(out_x["image"]), atol=1e-5)
    bins = out_p["bins"]
    assert bins.tile_gidx is None
    assert bins.pair_gidx.ndim == 1
    assert int(bins.pair_overflow) == 0

    # Budget broken (tiny K on a dense scene): the report fires.
    tiny = RasterizeConfig(max_gaussians_per_tile=2, tile_chunk=8,
                           backend="pallas", pair_budget_per_tile=2)
    bins2 = bin_gaussians(proj, W, H, tiny, opacities=scene["opacities"],
                          build_table=False, keep_pairs=True)
    assert int(bins2.pair_overflow) > 0

    # pair_budget_per_tile decouples the stream budget from K: a budget
    # that still holds every valid pair keeps the exact match (with a
    # smaller B), one that cannot reports pair_overflow.
    T = int(bins.pair_starts.shape[0])
    valid = int(jnp.sum(bins.tile_count))
    pb = -(-valid // T) + 1  # mean occupancy rounded up + 1 slack
    mean_fit = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8,
                               backend="pallas", pair_budget_per_tile=pb)
    out_b = rasterize_projected(proj, scene["colors"], scene["opacities"],
                                bg, W, H, mean_fit)
    np.testing.assert_allclose(np.asarray(out_b["image"]),
                               np.asarray(out_x["image"]), atol=1e-5)
    assert int(out_b["bins"].pair_overflow) == 0
    assert out_b["bins"].pair_gidx.shape[0] <= bins.pair_gidx.shape[0]
    starve = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8,
                             backend="pallas", pair_budget_per_tile=1)
    bins3 = bin_gaussians(proj, W, H, starve, opacities=scene["opacities"],
                          build_table=False, keep_pairs=True)
    assert bins3.pair_gidx.shape[0] < bins.pair_gidx.shape[0]
    assert int(bins3.pair_overflow) > 0


def test_unroll2_walk_matches(monkeypatch):
    """The UNROLL=2 chunk-pipelined walk (kept for A/B, off by default —
    measured slower on v5e, see rasterize_pallas.UNROLL) must stay
    BIT-identical to the default walk: same op order in the dependent
    tail, only the loop structure differs."""
    from gaussiangrasper_tpu.ops import rasterize_pallas as rp

    n = 300
    scene = make_scene(jax.random.key(21), n, width=W, height=H)
    proj = project_scene(scene)
    bg = jnp.zeros(3)
    _, pl_cfg = cfgs(n)

    def run():
        def loss(colors, opac):
            out = rasterize_projected(proj, colors, opac, bg, W, H, pl_cfg)
            return jnp.sum(out["image"] ** 2), out["image"]

        (l, img), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            scene["colors"], scene["opacities"])
        return np.asarray(img), jax.tree.map(np.asarray, g)

    img1, g1 = run()
    monkeypatch.setattr(rp, "UNROLL", 2)
    img2, g2 = run()
    np.testing.assert_array_equal(img1, img2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(a, b)


def test_bf16_kernel_compute_close_to_f32():
    """kernel_compute='bf16' casts only the MXU matmul INPUTS (prefix,
    color accumulation, gc/color-grad products) to bf16 with f32
    accumulators and f32 walk carries; the attribute stream and alpha
    chain stay f32. Images and gradients must track the f32 path within
    bf16 input-quantization tolerance (~2^-8 relative), and the f32 path
    must remain the bit-exact default off-TPU."""
    n = 200
    scene = make_scene(jax.random.key(13), n, width=W, height=H,
                       n_channels=5)
    proj = project_scene(scene)
    bg = jnp.linspace(0.1, 0.9, 5)
    target = jax.random.uniform(jax.random.key(2), (H, W, 5))

    def run(compute):
        cfg = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8,
                              backend="pallas", kernel_compute=compute)

        def loss(xys, conics, opac, colors):
            p = proj._replace(xys=xys, conics=conics)
            out = rasterize_projected(p, colors, opac, bg, W, H, cfg)
            return jnp.mean((out["image"] - target) ** 2), out["image"]

        (l, img), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(
            proj.xys, proj.conics, scene["opacities"], scene["colors"])
        return img, g

    img32, g32 = run("f32")
    img16, g16 = run("bf16")
    # default resolution off-TPU is f32 (bit-exact path)
    assert RasterizeConfig().resolved_kernel_compute() == "f32"
    np.testing.assert_allclose(np.asarray(img16), np.asarray(img32),
                               atol=2e-2, rtol=2e-2)
    assert float(jnp.max(jnp.abs(img16 - img32))) > 0.0  # actually bf16
    for a, b in zip(g16, g32):
        denom = np.maximum(np.abs(np.asarray(b)), 1e-3)
        rel = np.abs(np.asarray(a) - np.asarray(b)) / denom
        # quantization-scale agreement, not bit-exactness
        assert np.quantile(rel, 0.99) < 0.15, np.quantile(rel, 0.99)


def test_tile_pair_kernels_match(monkeypatch):
    """The GGT_TP=2 two-tile kernels (round 5: two independent walks
    interleaved per kernel instance to overlap the serial per-chunk MXU
    chains) must stay BIT-identical to the single-tile kernels — per-tile
    masks are unchanged, only instruction scheduling differs. Uses a
    96x80 scene so the tile count (9) is odd, exercising the
    phantom-tile pad."""
    from gaussiangrasper_tpu.ops import rasterize_pallas as rp

    n = 350
    w2, h2 = 96, 80
    scene = make_scene(jax.random.key(23), n, width=w2, height=h2,
                      n_channels=4)
    proj = project_scene(scene)
    bg = jnp.linspace(0.0, 1.0, 4)
    cfg = RasterizeConfig(max_gaussians_per_tile=n, tile_chunk=8,
                          backend="pallas")

    def run():
        def loss(xys, conics, opac, colors):
            p2 = proj._replace(xys=xys, conics=conics)
            out = rasterize_projected(p2, colors, opac, bg, w2, h2, cfg)
            return (jnp.sum(out["image"] ** 2)
                    + 0.1 * jnp.sum(out["alpha"]), out["image"])

        (l, img), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(
            proj.xys, proj.conics, scene["opacities"], scene["colors"])
        return np.asarray(img), jax.tree.map(np.asarray, g)

    img1, g1 = run()
    monkeypatch.setattr(rp, "TP", 2)
    img2, g2 = run()
    np.testing.assert_array_equal(img1, img2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(a, b)
