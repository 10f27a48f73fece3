"""Coverage for the weight-gated branches the round-1 verdict flagged as
untested dead ends: the LPIPS compute path runs with RANDOM VGG16-shaped
weights (only the trained values need a download), and the SAM mask glue
runs against a stub model with the transformers interface."""

import numpy as np
import pytest

from gaussiangrasper_tpu.utils import perceptual


@pytest.fixture
def vgg_weights(tmp_path, monkeypatch):
    path = tmp_path / "vgg16.npz"
    np.savez(path, **perceptual.random_weights(0))
    monkeypatch.setenv("GGT_VGG16_WEIGHTS", str(path))
    perceptual.reset_cache()
    yield path
    perceptual.reset_cache()


class TestLpips:
    def test_gated_without_weights(self, tmp_path, monkeypatch):
        monkeypatch.setenv("GGT_VGG16_WEIGHTS", str(tmp_path / "absent.npz"))
        perceptual.reset_cache()
        try:
            assert not perceptual.lpips_available()
            assert perceptual.lpips(np.zeros((32, 32, 3)),
                                    np.ones((32, 32, 3))) is None
        finally:
            perceptual.reset_cache()

    def test_real_path_with_random_weights(self, vgg_weights):
        assert perceptual.lpips_available()
        rng = np.random.default_rng(0)
        a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        b = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        same = perceptual.lpips(a, a)
        diff = perceptual.lpips(a, b)
        assert same == pytest.approx(0.0, abs=1e-6)
        assert diff is not None and diff > 1e-4

    def test_metric_is_symmetric(self, vgg_weights):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert perceptual.lpips(a, b) == pytest.approx(
            perceptual.lpips(b, a), rel=1e-5
        )


class TestSamGlue:
    def test_mask_assembly_from_stub_model(self):
        """sam_instance_masks' grid prompting, score ordering, min_area
        filter and id assignment, against a stub with the transformers
        SamModel/SamProcessor interface."""
        import torch

        from gaussiangrasper_tpu.scripts import segment

        h, w = 32, 48
        n_points = len(np.mgrid[0:h:max(h // 8, 1), 0:w:max(w // 8, 1)][0].ravel())

        class StubOut:
            def __init__(self):
                # (1, n_points, 3) masks per point, iou scores
                self.pred_masks = torch.zeros((1, n_points, 3, h, w))
                self.iou_scores = torch.zeros((1, n_points, 3))

        stub_out = StubOut()
        # point 0: big left-half mask, high score; point 1: tiny mask
        stub_out.pred_masks[0, 0, 0, :, : w // 2] = 5.0
        stub_out.iou_scores[0, 0, 0] = 0.9
        stub_out.pred_masks[0, 1, 0, :2, :2] = 5.0  # < min_area
        stub_out.iou_scores[0, 1, 0] = 0.5

        class StubModel:
            @staticmethod
            def from_pretrained(name):
                return StubModel()

            def __call__(self, **inputs):
                return stub_out

        class StubImageProcessor:
            def post_process_masks(self, masks, orig, reshaped):
                return [masks[0] > 0]

        class StubProcessor:
            image_processor = StubImageProcessor()

            @staticmethod
            def from_pretrained(name):
                return StubProcessor()

            def __call__(self, img, input_points, return_tensors):
                return {
                    "original_sizes": torch.tensor([[h, w]]),
                    "reshaped_input_sizes": torch.tensor([[h, w]]),
                }

        img = np.zeros((h, w, 3), np.uint8)
        out = segment.sam_instance_masks(
            img, "stub", min_area=50,
            model=StubModel(), proc=StubProcessor(),
        )
        assert out.shape == (h, w)
        # exactly one surviving instance (the big mask); tiny one filtered
        ids = set(np.unique(out))
        assert ids == {-1, 0}
        assert (out[:, : w // 2] == 0).all()
        assert (out[:, w // 2:] == -1).all()


class TestClipTextGlue:
    def test_encode_text_with_random_weights(self):
        """The real transformers CLIP text tower runs with RANDOM weights
        (tiny config, the trained values stay download-gated): exercises
        encode_text's tokenize -> get_text_features -> numpy plumbing and
        the downstream relevancy_map contract (query.py)."""
        import torch
        from transformers import CLIPConfig, CLIPModel

        from gaussiangrasper_tpu.scripts.query import encode_text, relevancy_map

        cfg = CLIPConfig(
            projection_dim=512,  # the pipeline's CLIP dim (ref 512)
            text_config={"hidden_size": 32, "intermediate_size": 64,
                         "num_hidden_layers": 2, "num_attention_heads": 2,
                         "vocab_size": 64, "max_position_embeddings": 16},
            vision_config={"hidden_size": 32, "intermediate_size": 64,
                           "num_hidden_layers": 1, "num_attention_heads": 2,
                           "image_size": 32, "patch_size": 16},
        )
        torch.manual_seed(0)
        model = CLIPModel(cfg)  # random init, no download

        class StubTokenizer:
            def __call__(self, text, return_tensors, padding):
                ids = torch.stack([
                    torch.tensor([(hash(w) % 60) + 1 for w in
                                  (t.split() + ["pad"] * 4)[:4]])
                    for t in text
                ])
                return {"input_ids": ids,
                        "attention_mask": torch.ones_like(ids)}

        emb = encode_text(["a red mug", "scissors"], model=model,
                          proc=StubTokenizer())
        assert emb.shape == (2, 512)
        assert np.isfinite(emb).all()
        # different prompts produce different embeddings
        assert np.abs(emb[0] - emb[1]).max() > 1e-4

        # end-to-end into the LERF relevancy math
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        clip_map = jnp.asarray(rng.normal(size=(8, 6, 512)).astype(np.float32))
        rel = relevancy_map(clip_map, jnp.asarray(emb[0]),
                            jnp.asarray(emb[1:]))
        assert rel.shape == (8, 6)
        assert float(rel.min()) >= 0.0 and float(rel.max()) <= 1.0
