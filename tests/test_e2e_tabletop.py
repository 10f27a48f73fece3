"""Real-image end-to-end gate on the ray-traced tabletop fixture.

Round-4 (VERDICT #4): every earlier training gate supervised with renders
of a random Gaussian field — a target the model fits by construction.
This trains the FULL EFD pipeline (RGB + depth + normal + SAM-contrastive
+ CLIP distillation) on ray-traced images of hard geometry the model
cannot trivially represent (gaussiangrasper_tpu/data/synthetic.py), then
checks feature queries and the scene-update flow end-to-end — the
reference's generate_data -> train.sh -> render/query -> update.sh chain
(ref /root/reference/scripts/generate_data.py:410-452, update.sh).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WH = 64
VIEWS = 6
TRAIN_STEPS = 300
FEATURE_DIM = 16


def _small_model_cfg():
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig
    from gaussiangrasper_tpu.ops.rasterize import RasterizeConfig

    return GaussianSplatConfig(
        feature_dim=FEATURE_DIM,
        sh_degree=1,
        num_downscales=0,
        warmup_length=30,
        refine_every=50,
        stop_split_at=TRAIN_STEPS,
        raster=RasterizeConfig(
            tile_size=16, max_gaussians_per_tile=1024, tile_chunk=4,
            max_tiles_per_gaussian=16,
        ),
    )


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


@pytest.mark.slow
class TestTabletopE2E:
    def test_train_feature_query_update(self, tmp_path):
        from gaussiangrasper_tpu.data.synthetic import (
            clip_vectors, generate_tabletop, move_object,
        )
        from gaussiangrasper_tpu.engine.trainer import TrainerConfig, make_trainer
        from gaussiangrasper_tpu.models.efd import mlp_apply
        from gaussiangrasper_tpu.models.model import render

        scene = generate_tabletop(tmp_path / "scene", width=WH, height=WH,
                                  n_views=VIEWS, feature_downscale=2)
        out = tmp_path / "runs"
        cfg = TrainerConfig(
            data=scene, output_dir=out, experiment_name="tabletop",
            max_iterations=TRAIN_STEPS, steps_per_save=TRAIN_STEPS,
            capacity=4096, prefetch=False, model=_small_model_cfg(),
        )
        trainer = make_trainer(cfg)
        state0 = trainer.setup()

        cam0, batch0 = trainer.dm.get_batch(0)
        gt0 = batch0["image"]
        r0 = render(state0.field, state0.alive, cam0, 0, cfg.model)
        psnr_before = _psnr(r0["rgb"], gt0)

        state = trainer.train()
        r1 = render(state.field, state.alive, cam0, TRAIN_STEPS, cfg.model)
        psnr_after = _psnr(r1["rgb"], gt0)
        # Real image-like data: from the seeded init the fit must improve
        # substantially (the fixture is not representable exactly, so the
        # bar is a climb, not a ceiling). Measured envelope (2026-08-21):
        # 11.9 -> ~14.1 dB at 300 steps with the FULL loss set — the
        # depth/normal terms trade ~3 dB of RGB against geometry, the
        # reference's own weighting (ref get_loss_dict sums depth L1 and
        # 0.5*MSE+0.5*cos normal at weight 1); RGB-only reaches ~17.5.
        # The bar sits ~0.6 dB under the measured point: a broken
        # gradient path shows up as NO climb, not a half-dB shave.
        assert psnr_after > psnr_before + 1.5, (psnr_before, psnr_after)
        assert psnr_after > 13.0, psnr_after

        # --- depth sanity: rendered z-depth tracks the ray-traced depth
        # (dataparser scale applies to both sides) ---
        dmask = np.asarray(batch0["depth"]) > 0.05
        derr = np.abs(np.asarray(r1["depth"][..., 0]) - np.asarray(batch0["depth"]))
        assert float(np.median(derr[dmask])) < 0.15

        # --- EFD feature query: lift rendered features to CLIP space and
        # match against the synthetic per-object embeddings ---
        ids = np.load(scene / "masks" / "r_000.npy")
        clips = clip_vectors()
        feat = np.asarray(r1["feature"])  # (H, W, F)
        own, cross = [], []
        for oid in (0, 1, 2, 3):
            ys, xs = np.nonzero(ids == oid)
            if len(ys) == 0:
                continue
            sel = slice(0, len(ys), max(len(ys) // 64, 1))
            lifted = np.asarray(mlp_apply(state.fea_up,
                                          jnp.asarray(feat[ys[sel], xs[sel]])))
            lifted = lifted / (np.linalg.norm(lifted, axis=-1, keepdims=True)
                               + 1e-8)
            for cid, vec in clips.items():
                cos = float(np.mean(lifted @ vec))
                (own if cid == oid else cross).append(cos)
        assert np.mean(own) > np.mean(cross) + 0.1, (np.mean(own),
                                                     np.mean(cross))

        # --- open-vocabulary query + grasp CLIs (the paper pipeline's
        # step 3, ref README.md:50: render -> CLIP query -> grasp): the
        # synthetic per-object "CLIP" embedding of sphere 1 must light up
        # sphere-1 pixels, and the grasp proposal must land on it ---
        from gaussiangrasper_tpu.scripts import grasp as grasp_cli
        from gaussiangrasper_tpu.scripts import query as query_cli

        run_dir = cfg.run_dir
        emb_path = tmp_path / "q_sphere1.npy"
        np.save(emb_path, clips[1])
        canon_path = tmp_path / "canon.npy"
        np.save(canon_path, np.stack([clips[0], clips[2], clips[3]]))
        qdir = tmp_path / "query_out"
        query_cli.main([
            "--run-dir", str(run_dir), "--text-embedding", str(emb_path),
            "--canonical-embedding", str(canon_path), "--views", "0",
            "--output", str(qdir),
        ])
        rel = np.load(qdir / "view0000_q0.npy")
        peak = np.unravel_index(np.argmax(rel), rel.shape)
        assert ids[peak] == 1, (peak, ids[peak])  # peak on sphere 1

        gdir = tmp_path / "grasp_out"
        grasp_cli.main([
            "--run-dir", str(run_dir), "--text-embedding", str(emb_path),
            "--canonical-embedding", str(canon_path), "--threshold", "0.5",
            "--output", str(gdir),
        ])
        import json as _json

        g = _json.loads((gdir / "grasp.json").read_text())
        from gaussiangrasper_tpu.data.synthetic import SPHERES

        # grasp position is in the model (dataparser-oriented) frame
        c1, r1, _ = SPHERES[1]
        tf = np.asarray(trainer.dm.outputs.dataparser_transform)
        sc = float(trainer.dm.outputs.dataparser_scale)
        c1_model = (tf[:, :3] @ c1 + tf[:, 3]) * sc
        assert np.linalg.norm(np.asarray(g["position"]) - c1_model) \
            < 3 * r1 * sc, (g, c1_model.tolist())

        # --- scene update: move sphere 1, fine-tune on the after capture
        # (ref update.sh flow) ---
        from gaussiangrasper_tpu.engine import checkpoint as ckpt
        from gaussiangrasper_tpu.scripts import update

        delta = (-0.55, 0.45, 0.0)
        after, obj_pts = move_object(tmp_path / "after", delta=delta,
                                     width=WH, height=WH, n_views=VIEWS,
                                     feature_downscale=2)
        obj_path = tmp_path / "obj.npy"
        np.save(obj_path, obj_pts)
        move = np.eye(4)
        move[:3, 3] = delta
        move_path = tmp_path / "move.npy"
        np.save(move_path, move)

        run_dir = cfg.run_dir
        update.main([
            "--run-dir", str(run_dir), "--edit-object", str(obj_path),
            "--transform-npy", str(move_path), "--after-data", str(after),
            "--max-iterations", "80",
        ])

        # the fine-tuned state must fit the AFTER capture better than the
        # pre-edit state does
        ft_cfg = dataclasses.replace(cfg, data=after, output_dir=tmp_path / "x",
                                     experiment_name="aftercheck")
        ft_trainer = make_trainer(ft_cfg)
        acam, abatch = ft_trainer.dm.get_batch(0)
        path = ckpt.latest_checkpoint(run_dir / "edit" / "checkpoints")
        edited = ckpt.load_checkpoint(path, state)
        r_old = render(state.field, state.alive, acam, TRAIN_STEPS, cfg.model)
        r_new = render(edited.field, edited.alive, acam, TRAIN_STEPS, cfg.model)
        agt = abatch["image"]
        # measured: +0.7 dB after 40 finetune iters, +1 and climbing at 80
        # (the reference runs 580); the bar catches a no-op edit, which
        # measures ~0.
        assert _psnr(r_new["rgb"], agt) > _psnr(r_old["rgb"], agt) + 0.5
