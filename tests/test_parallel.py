"""Sharded training over a virtual 8-device CPU mesh.

The conftest forces --xla_force_host_platform_device_count=8, so these run
the REAL pjit path (capacity-sharded field, dp-sharded cameras, XLA-
inserted collectives) without TPU hardware — the strategy SURVEY.md §4
prescribes for multi-device testing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.test_engine as T
from gaussiangrasper_tpu.engine.train_state import init_train_state
from gaussiangrasper_tpu.models.efd import init_mlp
from gaussiangrasper_tpu.models.model import train_loss
from gaussiangrasper_tpu.parallel import (
    composite_tile_sharded,
    make_mesh,
    make_sharded_train_step,
    shard_train_state,
    tile_sharded_compositor,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def build(cap=128):
    key = jax.random.PRNGKey(0)
    field, alive, cam = T.tiny_setup(key, n=64, cap=cap)
    fea_up = init_mlp(key, T.F, 512, (32,))
    state = init_train_state(jax.random.PRNGKey(1), field, alive, fea_up)
    return state, cam


def batch_of(rng, b):
    batches = [T.tiny_batch(rng) for _ in range(b)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *batches)


def test_mesh_shapes():
    mesh = make_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "gauss": 4}
    mesh = make_mesh(gauss=8)
    assert mesh.shape == {"dp": 1, "gauss": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=3)


def test_sharded_step_matches_per_camera_mean():
    cfg = T.small_cfg()
    rng = np.random.default_rng(0)
    state, cam = build()
    mesh = make_mesh(dp=2)
    sharded = shard_train_state(state, mesh)

    b = 2
    cams = jax.tree.map(lambda l: jnp.broadcast_to(l, (b,) + l.shape), cam)
    batches = batch_of(rng, b)

    # reference first: step_fn donates its state, which may alias these
    # buffers (device_put can be zero-copy)
    model_state = {"field": state.field, "fea_up": state.fea_up}
    singles = [
        float(
            train_loss(
                model_state, state.alive, cam,
                jax.tree.map(lambda l: l[i], batches), 0, cfg,
            )[0]
        )
        for i in range(b)
    ]
    opac_before = np.asarray(state.field.opacity_logits).copy()

    step_fn = make_sharded_train_step(mesh, cfg, state.field.capacity)
    new_state, metrics = step_fn(sharded, cams, batches)
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(singles), rtol=1e-4)
    assert int(new_state.step) == 1
    # parameters moved (opacity group applies every step)
    assert not np.allclose(np.asarray(new_state.field.opacity_logits), opac_before)
    # stats accumulated from both cameras' visibility
    assert float(jnp.sum(new_state.stats.vis_counts)) > 0


def test_sharded_state_layout():
    state, _ = build(cap=128)
    mesh = make_mesh(dp=2)
    sharded = shard_train_state(state, mesh)
    shard_sizes = {
        s.data.shape for s in sharded.field.means.addressable_shards
    }
    # capacity axis split over gauss=4
    assert shard_sizes == {(32, 3)}
    # fea_up replicated
    w0 = next(iter(sharded.fea_up.values()))
    assert len({s.data.shape for s in w0.addressable_shards}) == 1


class TestTileSharded:
    """The north-star render path: Gaussians sharded, culled survivors
    all-gathered, image tiles composited in per-device bands. Must match
    the single-device pipeline bit-for-bit (images AND gradients)."""

    def _scene(self, n=600, width=96, height=80, channels=5):
        import tests.test_rasterize as R

        scene = R.make_scene(jax.random.key(9), n, width=width,
                             height=height, n_channels=channels)
        proj = R.project_scene(scene)
        return scene, proj

    def test_matches_unsharded_images_and_grads(self):
        from gaussiangrasper_tpu.ops.rasterize import (
            RasterizeConfig, rasterize_projected,
        )

        scene, proj = self._scene()
        mesh = make_mesh(gauss=8)
        cfg = RasterizeConfig(tile_chunk=4)
        bg = jnp.linspace(0.0, 1.0, 5)
        w, h = scene["cam"].width, scene["cam"].height
        target = jax.random.uniform(jax.random.key(1), (h, w, 5))

        def loss_with(compositor):
            def loss(xys, conics, opac, colors):
                p = proj._replace(xys=xys, conics=conics)
                out = compositor(p, colors, opac, bg, w, h, cfg)
                return jnp.mean(jnp.abs(out["image"] - target)), out

            return loss

        args = (proj.xys, proj.conics, scene["opacities"], scene["colors"])
        (l_ref, out_ref), g_ref = jax.value_and_grad(
            loss_with(rasterize_projected), argnums=(0, 1, 2, 3),
            has_aux=True)(*args)
        sharded = tile_sharded_compositor(mesh)
        (l_sh, out_sh), g_sh = jax.value_and_grad(
            loss_with(sharded), argnums=(0, 1, 2, 3), has_aux=True)(*args)

        np.testing.assert_allclose(np.asarray(out_sh["image"]),
                                   np.asarray(out_ref["image"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_sh["alpha"]),
                                   np.asarray(out_ref["alpha"]), atol=1e-6)
        for a, b in zip(g_sh, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
        # no drops at the default (full) gather budget
        assert int(out_sh["bins"].gather_overflow) == 0
        assert int(out_sh["bins"].gathered_rows) > 0

    @pytest.mark.slow
    def test_gather_budget_reports_overflow(self):
        from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

        scene, proj = self._scene(n=320)
        mesh = make_mesh(gauss=8)
        bg = jnp.zeros(5)
        w, h = scene["cam"].width, scene["cam"].height
        # budget of 2 rows/device cannot hold ~40 visible rows/shard
        out = composite_tile_sharded(
            proj, scene["colors"], scene["opacities"], bg, w, h,
            RasterizeConfig(tile_chunk=4), mesh=mesh, gather_budget=2,
        )
        assert int(out["bins"].gather_overflow) > 0

    @pytest.mark.slow
    def test_render_through_model_compositor_hook(self):
        """models.model.render(compositor=...) routes the fused 39-channel
        pass through the sharded composite."""
        from gaussiangrasper_tpu.models.gaussian_field import init_random
        from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render
        from gaussiangrasper_tpu.core.cameras import Camera

        field, alive = init_random(jax.random.PRNGKey(3), 120, extent=1.5,
                                   feature_dim=8, capacity=128,
                                   init_scale=0.08)
        field = field._replace(means=field.means + jnp.array([0., 0., -3.]))
        cam = Camera.create(fx=60., fy=60., cx=32., cy=24.,
                            camera_to_world=jnp.eye(4)[:3], width=64,
                            height=48)
        cfg = GaussianSplatConfig(feature_dim=8)
        mesh = make_mesh(gauss=8)
        ref = render(field, alive, cam, 0, cfg)
        sh = render(field, alive, cam, 0, cfg,
                    compositor=tile_sharded_compositor(mesh))
        for k in ("rgb", "feature", "depth", "normal"):
            np.testing.assert_allclose(np.asarray(sh[k]), np.asarray(ref[k]),
                                       atol=1e-6, err_msg=k)
        # dead capacity slots (128 cap, 120 alive) are not gathered
        assert int(sh["bins"].gathered_rows) <= 120

    def test_tile_sharded_train_step_matches(self):
        """The full sharded train step with tile_shard=True produces the
        same loss/psnr and parameter update as the round-1 full-gather
        step (dp=1 mesh, one camera)."""
        cfg = T.small_cfg()
        rng = np.random.default_rng(3)
        state, cam = build()
        mesh = make_mesh(gauss=8)

        b = 1
        cams = jax.tree.map(lambda l: jnp.broadcast_to(l, (b,) + l.shape), cam)
        batches = batch_of(rng, b)

        results = {}
        for name, kw in (("full", {}), ("tile", {"tile_shard": True})):
            st = shard_train_state(build()[0], mesh)
            step = make_sharded_train_step(mesh, cfg, 128, **kw)
            st2, metrics = step(st, cams, batches)
            if name == "tile":
                # gather stats must reach the production metrics dict
                # (round-3 verdict weak #2)
                assert "gathered_rows" in metrics
                assert int(metrics["gather_overflow"]) == 0
            results[name] = (np.asarray(st2.field.means),
                             float(metrics["loss"]), float(metrics["psnr"]))
        np.testing.assert_allclose(results["tile"][0], results["full"][0],
                                   atol=1e-6)
        assert results["tile"][1] == pytest.approx(results["full"][1],
                                                   rel=1e-5)

    def test_tile_sharded_composes_with_dp(self):
        """2-D layout (round-3): dp=2 cameras x gauss=4 tile bands in one
        program (vmap spmd_axis_name="dp" over the gauss shard_map). The
        tile-sharded step must match the full-gather step on the SAME
        dp=2 mesh — loss, psnr and parameter update."""
        cfg = T.small_cfg()
        rng = np.random.default_rng(4)
        state, cam = build()
        mesh = make_mesh(dp=2, gauss=4)

        b = 2
        cams = jax.tree.map(lambda l: jnp.broadcast_to(l, (b,) + l.shape), cam)
        batches = batch_of(rng, b)

        results = {}
        for name, kw in (("full", {}), ("tile", {"tile_shard": True})):
            st = shard_train_state(build()[0], mesh)
            step = make_sharded_train_step(mesh, cfg, 128, **kw)
            st2, metrics = step(st, cams, batches)
            results[name] = (np.asarray(st2.field.means),
                             float(metrics["loss"]), float(metrics["psnr"]))
        np.testing.assert_allclose(results["tile"][0], results["full"][0],
                                   atol=1e-6)
        assert results["tile"][1] == pytest.approx(results["full"][1],
                                                   rel=1e-5)


@pytest.mark.slow
def test_sharded_host_loop_cli(tmp_path):
    """--mesh CLI path: sharded training loop end-to-end on the virtual
    mesh, with refinement and checkpointing."""
    import json

    from PIL import Image

    data = tmp_path / "scene"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        name = f"f{i}.png"
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(
            data / "images" / name
        )
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": pose.tolist()})
    (data / "transforms.json").write_text(json.dumps(
        {"fl_x": 25.0, "fl_y": 25.0, "cx": 16, "cy": 12, "w": 32, "h": 24,
         "frames": frames}))

    from gaussiangrasper_tpu.scripts import train

    out = tmp_path / "out"
    train.main([
        "--data", str(data), "--output-dir", str(out),
        "--experiment-name", "sharded", "--mesh", "2,4",
        "--tile-shard", "on",
        "--max-iterations", "4", "--steps-per-save", "4",
        "--feature-dim", "8", "--sh-degree", "1",
        "--warmup-length", "2", "--refine-every", "3",
    ])
    ckpts = list((out / "sharded" / "checkpoints").iterdir())
    assert len(ckpts) == 1


class TestAutoGatherBudget:
    """derive_gather_budget: the default tile-shard path must skip dead
    capacity (round-2 verdict weak #5 — a None budget used to transmit
    the full shard)."""

    def test_derivation_rounding_and_clipping(self):
        from gaussiangrasper_tpu.parallel.tile_shard import derive_gather_budget

        # balanced (interleaved) layout: 1000 alive spread over 8 shards
        # -> worst shard 125, *1.25 = 157 -> 256 after the 128-row quantum
        alive = (jnp.arange(8192) % 8) < 1  # ~1024 alive, 128/shard
        assert derive_gather_budget(alive, 8) == 256
        assert derive_gather_budget(jnp.zeros(8192, bool), 8) == 128  # floor
        # budget never exceeds the shard size
        assert derive_gather_budget(jnp.ones(1024, bool), 8) == 128

    def test_layout_aware_prefix_field(self):
        """A freshly seeded field packs alive into a capacity PREFIX —
        the budget must cover the worst CONTIGUOUS shard, not the
        balanced average (which silently overflowed shard 0, round 4)."""
        from gaussiangrasper_tpu.parallel.tile_shard import derive_gather_budget

        alive = jnp.zeros(8192, bool).at[:1000].set(True)
        # shard 0 holds all 1000 -> 1250 -> 1280 -> clipped to 1024/shard
        assert derive_gather_budget(alive, 8) == 1024

    def test_mostly_dead_field_gathers_few_rows(self):
        """90%-dead field, NO explicit budget: the sharded step derives one
        from alive, gathers far fewer rows than capacity, zero overflow,
        and still matches the unsharded image."""
        import tests.test_rasterize as R
        from gaussiangrasper_tpu.ops.rasterize import (
            RasterizeConfig, rasterize_projected,
        )
        from gaussiangrasper_tpu.parallel.tile_shard import (
            derive_gather_budget,
        )

        n = 8192  # big enough that the 128-row/device quantum is << shard
        scene = R.make_scene(jax.random.key(4), n, width=64, height=48,
                             n_channels=4)
        proj = R.project_scene(scene)
        # kill 90% of the field the way capacity slots die: no radius
        alive = (jnp.arange(n) % 10) == 0
        proj = proj._replace(radii=jnp.where(alive, proj.radii, 0.0))
        mesh = make_mesh(gauss=8)
        cfg = RasterizeConfig(tile_chunk=4)
        bg = jnp.zeros(4)
        w, h = scene["cam"].width, scene["cam"].height

        budget = derive_gather_budget(alive, mesh.shape["gauss"])
        assert budget * mesh.shape["gauss"] < n // 2  # skips dead capacity

        out = composite_tile_sharded(
            proj, scene["colors"], scene["opacities"], bg, w, h, cfg,
            mesh=mesh, gather_budget=budget,
        )
        assert int(out["bins"].gather_overflow) == 0
        assert int(out["bins"].gathered_rows) <= int(alive.sum())
        ref = rasterize_projected(
            proj, scene["colors"], scene["opacities"], bg, w, h, cfg,
        )
        np.testing.assert_allclose(np.asarray(out["image"]),
                                   np.asarray(ref["image"]), atol=1e-6)

    def test_sharded_step_derives_budget_from_alive(self):
        """make_sharded_train_step(tile_shard=True, alive=...) with no
        explicit budget builds and runs (the __graft_entry__ leg contract)."""
        from gaussiangrasper_tpu.engine.train_state import init_train_state
        from gaussiangrasper_tpu.models.efd import init_mlp
        from gaussiangrasper_tpu.models.gaussian_field import init_random
        from gaussiangrasper_tpu.models.model import GaussianSplatConfig
        from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig
        from gaussiangrasper_tpu.parallel.train import (
            make_sharded_train_step, shard_train_state,
        )
        import __graft_entry__ as ge

        cap = 256
        cfg = GaussianSplatConfig(
            feature_dim=8,
            raster=RasterizeConfig(tile_size=8, max_gaussians_per_tile=64,
                                   tile_chunk=4),
        )
        key = jax.random.PRNGKey(0)
        field, alive, cam = ge._tiny_scene(key, n=64, cap=cap, feature_dim=8)
        mesh = make_mesh(dp=1)
        state = init_train_state(key, field, alive, init_mlp(key, 8, 512, (32,)))
        state = shard_train_state(state, mesh)
        step = make_sharded_train_step(mesh, cfg, cap, tile_shard=True,
                                       alive=alive)
        cams = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (1,) + l.shape)
            if hasattr(l, "shape") else l, cam)
        batches = jax.vmap(ge._tiny_batch)(jax.random.split(key, 1))
        state, metrics = step(state, cams, batches)
        assert bool(jnp.isfinite(metrics["loss"]))


class TestMergeBinning:
    """Round-3 bin-once: per-device sorts are 1/D-size (local shard pairs
    + band merge) instead of every band re-sorting the full gathered
    N*MT grid (the round-2 duplicated sort)."""

    def test_full_size_sort_gone_from_hlo(self):
        import re

        import tests.test_rasterize as R
        from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

        n, w, h = 640, 64, 48
        scene = R.make_scene(jax.random.key(7), n, width=w, height=h,
                             n_channels=4)
        proj = R.project_scene(scene)
        mesh = make_mesh(gauss=8)
        cfg = RasterizeConfig(tile_size=8, tile_chunk=4,
                              max_tiles_per_gaussian=8)
        bg = jnp.zeros(4)
        d = 8
        mt = 8
        full_pairs = n * mt          # what each band sorted in round 2
        local_pairs = (n // d) * mt  # the merge path's per-device sort

        def run(mode):
            f = jax.jit(lambda p, c, o: composite_tile_sharded(
                p, c, o, bg, w, h, cfg, mesh=mesh, bin_mode=mode
            )["image"])
            return f.lower(proj, scene["colors"],
                           scene["opacities"]).compile().as_text()

        def sort_sizes(hlo):
            # result shape of each sort op: %sort.N = (s32[SIZE]{0}, ...
            return [int(m) for m in re.findall(
                r"%sort\.?\d*\s*=\s*\(?[a-z0-9]+\[(\d+)\]", hlo)]

        merge_sizes = sort_sizes(run("merge"))
        repl_sizes = sort_sizes(run("replicated"))
        assert any(s >= full_pairs for s in repl_sizes), repl_sizes
        assert merge_sizes and all(s < full_pairs for s in merge_sizes), (
            merge_sizes)
        assert any(s == local_pairs for s in merge_sizes), merge_sizes

    def test_merge_matches_replicated_and_unsharded(self):
        import tests.test_rasterize as R
        from gaussiangrasper_tpu.ops.rasterize import (
            RasterizeConfig, rasterize_projected,
        )

        scene = R.make_scene(jax.random.key(8), 720, width=96, height=64,
                             n_channels=5)
        proj = R.project_scene(scene)
        mesh = make_mesh(gauss=8)
        cfg = RasterizeConfig(tile_chunk=4)
        bg = jnp.linspace(0, 1, 5)
        w, h = 96, 64
        ref = rasterize_projected(proj, scene["colors"], scene["opacities"],
                                  bg, w, h, cfg)
        for mode in ("merge", "replicated"):
            out = composite_tile_sharded(
                proj, scene["colors"], scene["opacities"], bg, w, h, cfg,
                mesh=mesh, bin_mode=mode,
            )
            np.testing.assert_allclose(np.asarray(out["image"]),
                                       np.asarray(ref["image"]), atol=1e-6,
                                       err_msg=mode)
        assert int(out["bins"].merge_overflow) == 0

    def test_undersized_band_budget_reports_merge_overflow_only(self):
        """Regression for the documented band-path accounting (tile_shard
        .py merge_binned_band): the per-source extraction budget `bpb` is
        the band path's ONLY pair clamp — its drops land in
        merge_overflow, while composite_pair_stream's B clamp is
        structurally zero (the merged stream has static size d*bpb and
        every segment lies inside it). Verified by (a) a deliberately
        undersized budget reporting merge_overflow > 0, and (b) the
        pallas pair-stream branch and the xla table branch producing
        IDENTICAL images under that budget — if the pallas branch had an
        extra unreported clamp the two would diverge."""
        import tests.test_rasterize as R
        from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

        scene = R.make_scene(jax.random.key(11), 720, width=96, height=64,
                             n_channels=4)
        proj = R.project_scene(scene)
        mesh = make_mesh(gauss=8)
        bg = jnp.zeros(4)
        w, h = 96, 64

        def run(backend, bpb):
            cfg = RasterizeConfig(tile_chunk=4, backend=backend)
            return composite_tile_sharded(
                proj, scene["colors"], scene["opacities"], bg, w, h, cfg,
                mesh=mesh, bin_mode="merge", band_pair_budget=bpb,
            )

        # (a) undersized budget: drops are REPORTED, never silent
        tight = run("xla", 32)
        assert int(tight["bins"].merge_overflow) > 0
        # (b) both backends clip identically under the same budget
        tight_p = run("pallas", 32)
        np.testing.assert_allclose(np.asarray(tight_p["image"]),
                                   np.asarray(tight["image"]), atol=1e-6)
        assert int(tight_p["bins"].merge_overflow) == int(
            tight["bins"].merge_overflow)
        # (c) adequate budget: no drops, matches the default-path image
        ok = run("xla", None)
        assert int(ok["bins"].merge_overflow) == 0
        assert not np.allclose(np.asarray(tight["image"]),
                               np.asarray(ok["image"]), atol=1e-6)


def _mini_scene(tmp_path, n_imgs=4):
    """Tiny transforms.json scene shared by the sharded-CLI tests."""
    import json

    from PIL import Image

    data = tmp_path / "scene"
    (data / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_imgs):
        name = f"f{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        ).save(data / "images" / name)
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": pose.tolist()})
    (data / "transforms.json").write_text(json.dumps(
        {"fl_x": 25.0, "fl_y": 25.0, "cx": 16, "cy": 12, "w": 32, "h": 24,
         "frames": frames}))
    return data


def test_sharded_scene_update_cli(tmp_path, capsys):
    """BASELINE config 5 composition (round-4 verdict #5): the scene-
    update fine-tune runs through the SHARDED host loop — hull-select ->
    rigid transform -> train_sharded on a gauss mesh with tile-shard
    auto-on (the reference re-enters its DDP-capable train_loop,
    ref update.py:163-177)."""
    pytest.importorskip("scipy")
    from gaussiangrasper_tpu.scripts import train, update

    data = _mini_scene(tmp_path)
    out = tmp_path / "out"
    train.main([
        "--data", str(data), "--output-dir", str(out),
        "--experiment-name", "base",
        "--max-iterations", "2", "--steps-per-save", "2",
        "--capacity", "512",
        "--feature-dim", "8", "--sh-degree", "1",
        "--warmup-length", "99", "--refine-every", "100",
    ])
    run_dir = out / "base"

    # a hull that surely contains some gaussians + a small rigid move
    obj = tmp_path / "obj.npy"
    np.save(obj, np.array([[x, y, z] for x in (-9, 9) for y in (-9, 9)
                           for z in (-9, 9)], np.float64))
    move = np.eye(4)
    move[:3, 3] = (0.1, 0.0, 0.0)
    move_path = tmp_path / "move.npy"
    np.save(move_path, move)

    after = _mini_scene(tmp_path / "after_dir")
    update.main([
        "--run-dir", str(run_dir), "--edit-object", str(obj),
        "--transform-npy", str(move_path), "--after-data", str(after),
        "--max-iterations", "3", "--mesh", "2,4",
    ])
    # the sharded loop ran (its summary line) and saved the edit ckpt
    assert "sharded:" in capsys.readouterr().out
    from gaussiangrasper_tpu.engine import checkpoint as ckpt

    assert ckpt.latest_checkpoint(run_dir / "edit" / "checkpoints")


def test_multi_scene_dp_mesh(tmp_path):
    """Multi-scene batch training sharded over a dp mesh (BASELINE
    config 4 on a slice): 2 scenes advance on 2 devices in one jitted
    vmapped step; the shared up_net mean becomes a cross-device reduce."""
    from gaussiangrasper_tpu.engine.multi_scene import train_multi
    from gaussiangrasper_tpu.engine.trainer import TrainerConfig
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

    dirs = [_mini_scene(tmp_path / f"s{i}") for i in range(2)]
    cfg = TrainerConfig(
        data=dirs[0], output_dir=tmp_path / "out", experiment_name="multi",
        max_iterations=3, steps_per_save=3, prefetch=False,
        model=GaussianSplatConfig(
            feature_dim=8, sh_degree=1, warmup_length=99, refine_every=2,
            raster=RasterizeConfig(tile_size=8, max_gaussians_per_tile=64,
                                   tile_chunk=4),
        ),
    )
    states = train_multi(cfg, dirs, dp=2)
    assert len(states) == 2
    for i in range(2):
        from gaussiangrasper_tpu.engine import checkpoint as ckpt

        assert ckpt.latest_checkpoint(
            cfg.run_dir / f"scene_{i}" / "checkpoints")
    # up_net shared: identical across scenes after training
    w0, w1 = (jax.tree.leaves(s.fea_up) for s in states)
    for a, b in zip(w0, w1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
