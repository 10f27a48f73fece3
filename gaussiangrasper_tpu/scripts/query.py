"""Open-vocabulary querying: CLIP relevancy maps from rendered features.

The GaussianGrasper paper pipeline queries the distilled feature field
with CLIP text embeddings to localize graspable objects (reference
README.md:50-59; the grasp module itself is unreleased — README.md:59).
This tool renders the latent feature map for chosen views, lifts it to
CLIP space with the trained fea_up MLP, and computes the standard LERF-
style relevancy score against a text embedding:

  relevancy = min_i softmax(cos(f, q) / cos(f, canon_i))  over canonical
  phrases ("object", "things", "stuff", "texture")

Text embeddings come from --text-embedding (a .npy of one or more 512-d
CLIP text vectors) or, when network weights are available, from the
transformers CLIP text tower via --text.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.models.efd import mlp_apply
from gaussiangrasper_tpu.models.model import render as render_fn
from gaussiangrasper_tpu.scripts.common import load_run


def encode_text(prompts, model=None, proc=None):
    """CLIP ViT-B/16 text embeddings via transformers (requires cached
    weights; offline images should pass --text-embedding instead).

    model/proc: optional pre-built CLIPModel / processor (dependency
    injection — tests run the real get_text_features plumbing with a
    randomly initialized model, the same trick as utils/perceptual.py;
    only the trained values need a download)."""
    import torch

    if model is None or proc is None:
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained("openai/clip-vit-base-patch16")
        proc = CLIPProcessor.from_pretrained("openai/clip-vit-base-patch16")
    with torch.no_grad():
        inp = proc(text=prompts, return_tensors="pt", padding=True)
        emb = model.get_text_features(**inp)
    return emb.numpy()


def relevancy_map(
    clip_map: jnp.ndarray,   # (H, W, 512)
    query: jnp.ndarray,      # (512,)
    canonical: jnp.ndarray,  # (K, 512)
) -> jnp.ndarray:
    """LERF relevancy: min over canonicals of pairwise softmax."""
    f = clip_map / (jnp.linalg.norm(clip_map, axis=-1, keepdims=True) + 1e-8)
    q = query / (jnp.linalg.norm(query) + 1e-8)
    c = canonical / (jnp.linalg.norm(canonical, axis=-1, keepdims=True) + 1e-8)
    pos = f @ q  # (H, W)
    negs = jnp.einsum("hwd,kd->hwk", f, c)
    pair = jnp.exp(pos)[..., None] / (jnp.exp(pos)[..., None] + jnp.exp(negs))
    return jnp.min(pair, axis=-1)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="CLIP-query a trained feature field")
    p.add_argument("--run-dir", type=Path, required=True)
    p.add_argument("--text", type=str, default=None)
    p.add_argument("--text-embedding", type=Path, default=None,
                   help=".npy (512,) or (Q,512) CLIP text embedding(s)")
    p.add_argument("--canonical-embedding", type=Path, default=None,
                   help=".npy (K,512) canonical-phrase embeddings")
    p.add_argument("--views", type=int, nargs="*", default=[0])
    p.add_argument("--output", type=Path, default=None)
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args(argv)

    from PIL import Image

    config, trainer, state = load_run(args.run_dir)
    out_dir = args.output or (args.run_dir / "query")
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.text_embedding is not None:
        q = np.load(args.text_embedding).reshape(-1, 512)
    elif args.text is not None:
        q = encode_text([args.text])
    else:
        raise SystemExit("give --text or --text-embedding")
    if args.canonical_embedding is not None:
        canon = np.load(args.canonical_embedding)
    elif args.text is not None and args.text_embedding is None:
        canon = encode_text(["object", "things", "stuff", "texture"])
    else:
        canon = np.zeros((1, 512), np.float32)  # degenerate -> plain cosine

    render_jit = jax.jit(
        lambda f, a, c: render_fn(f, a, c, state.step, config.model)
    )
    for v in args.views:
        cam, _ = trainer.dm.get_batch(v)
        outs = render_jit(state.field, state.alive, cam)
        fea = outs["feature"]
        clip_map = mlp_apply(state.fea_up, fea.reshape(-1, fea.shape[-1]))
        clip_map = clip_map.reshape(fea.shape[0], fea.shape[1], -1)
        for qi, qvec in enumerate(q):
            rel = np.asarray(
                relevancy_map(clip_map, jnp.asarray(qvec), jnp.asarray(canon))
            )
            np.save(out_dir / f"view{v:04d}_q{qi}.npy", rel)
            heat = (np.clip(rel, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(heat).save(out_dir / f"view{v:04d}_q{qi}.png")
            ys, xs = np.nonzero(rel > args.threshold)
            if len(ys):
                print(f"view {v} query {qi}: peak {rel.max():.3f} at "
                      f"({ys.mean():.0f}, {xs.mean():.0f}), {len(ys)} px over thresh")
            else:
                print(f"view {v} query {qi}: peak {rel.max():.3f}, nothing over thresh")


if __name__ == "__main__":
    main()
