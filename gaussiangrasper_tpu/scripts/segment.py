"""Build SAM-style instance masks (+ boundary masks) for a dataset.

Role of the reference's LangSAM tooling (scripts/lang_sam_test.py,
lang_sam_visualier.py in /root/reference: text-prompted SAM segmentation
producing the masks/ and boundary_mask/ directories the training loss
consumes). Two backends:

  --backend sam      transformers' SAM (facebook/sam-vit-base) automatic
                     mask generation — requires cached weights (this image
                     has zero egress, so only works if pre-downloaded).
  --backend classic  dependency-free fallback: mean-shift-ish color
                     quantization + connected components + border cleanup.
                     Crude next to SAM, but produces the same artifact
                     format so the full training pipeline runs offline.

Outputs <data>/masks/<stem>.npy (int32 instance ids, -1 = background) and
<data>/boundary_mask/<stem>.npy (uint8 validity).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def classic_instance_masks(
    img: np.ndarray, n_colors: int = 8, min_area: int = 200
) -> np.ndarray:
    """Color-quantized connected components as pseudo-instances."""
    import cv2

    small = cv2.bilateralFilter(img, 9, 50, 50)
    z = small.reshape(-1, 3).astype(np.float32)
    _, labels, centers = cv2.kmeans(
        z, n_colors, None,
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0),
        3, cv2.KMEANS_PP_CENTERS,
    )
    quant = labels.reshape(img.shape[:2])
    out = np.full(img.shape[:2], -1, np.int32)
    next_id = 0
    for c in range(n_colors):
        num, comp = cv2.connectedComponents((quant == c).astype(np.uint8))
        for k in range(1, num):
            m = comp == k
            if m.sum() >= min_area:
                out[m] = next_id
                next_id += 1
    return out


def sam_instance_masks(img: np.ndarray, model_name: str, min_area: int = 200,
                       model=None, proc=None):
    """Automatic SAM masks over a point grid (the lang_sam analog without
    the text grounding — grounding needs GroundingDINO weights).

    model/proc: optional pre-built SamModel/SamProcessor (dependency
    injection — tests exercise the mask-assembly glue with stubs; the
    default loads cached weights by name)."""
    import torch

    if model is None or proc is None:
        from transformers import SamModel, SamProcessor

        model = SamModel.from_pretrained(model_name)
        proc = SamProcessor.from_pretrained(model_name)
    h, w = img.shape[:2]
    gy, gx = np.mgrid[0:h:max(h // 8, 1), 0:w:max(w // 8, 1)]
    points = [[[int(x), int(y)]] for y, x in zip(gy.ravel(), gx.ravel())]
    out = np.full((h, w), -1, np.int32)
    next_id = 0
    with torch.no_grad():
        inputs = proc(img, input_points=[points], return_tensors="pt")
        outputs = model(**inputs)
        masks = proc.image_processor.post_process_masks(
            outputs.pred_masks.cpu(), inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu(),
        )[0]
        scores = outputs.iou_scores.cpu().numpy()[0]
    order = np.argsort(scores[:, 0])
    for i in order:
        m = np.asarray(masks[i, 0]).astype(bool)
        if m.sum() >= min_area:
            out[m] = next_id
            next_id += 1
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Generate instance masks for a dataset")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--backend", choices=("sam", "classic"), default="classic")
    p.add_argument("--sam-model", type=str, default="facebook/sam-vit-base")
    p.add_argument("--n-colors", type=int, default=8)
    p.add_argument("--min-area", type=int, default=200)
    args = p.parse_args(argv)

    from PIL import Image

    data = Path(args.data)
    (data / "masks").mkdir(exist_ok=True)
    (data / "boundary_mask").mkdir(exist_ok=True)
    images = sorted((data / "images").iterdir())
    for path in images:
        img = np.asarray(Image.open(path))[..., :3]
        if args.backend == "sam":
            try:
                masks = sam_instance_masks(img, args.sam_model, args.min_area)
            except Exception as e:  # no cached weights / no net
                raise SystemExit(
                    f"SAM backend unavailable ({type(e).__name__}: {e}); "
                    "use --backend classic or pre-cache the weights"
                )
        else:
            masks = classic_instance_masks(img, args.n_colors, args.min_area)
        np.save(data / "masks" / f"{path.stem}.npy", masks)
        np.save(
            data / "boundary_mask" / f"{path.stem}.npy",
            np.ones(img.shape[:2], np.uint8),
        )
        print(f"{path.name}: {masks.max() + 1} instances")


if __name__ == "__main__":
    main()
