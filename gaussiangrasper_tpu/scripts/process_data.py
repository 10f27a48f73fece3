"""Capture ingestion: images / video / polycam -> a trainable dataset.

Role of the reference's `ns-process-data` (nerfstudio/scripts/
process_data.py + nerfstudio/process_data/): turn raw captures into the
images + transforms.json layout the dataparsers read.

Subcommands:
  images   copy + downscale (x2/x4/x8, process_data_utils.downscale_images)
           and, when a COLMAP reconstruction is present, convert it to
           transforms.json (colmap_utils.colmap_to_json:386-464 — the
           OpenCV->OpenGL flip + [1,0,2] row permute + z-negate). Running
           COLMAP itself requires the `colmap` binary; if absent and no
           reconstruction exists, a clear hint is printed (this image has
           no COLMAP — RGB-D captures go through scripts/generate_data.py
           instead).
  video    ffmpeg frame extraction (process_data_utils.convert_video_to_images)
           then the same pipeline; gated on an ffmpeg binary.
  polycam  convert a Polycam export's keyframes/{images,cameras} to
           transforms.json (polycam_utils.polycam_to_json:28-88, incl.
           blur-score filtering, border crop, and the [t_2*, t_0*, t_1*]
           row order).
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
from pathlib import Path

import numpy as np

DOWNSCALES = (2, 4, 8)


def _downscale(image_dir: Path) -> None:
    """images/ -> images_2/, images_4/, images_8/ (the reference's
    downscale convention consumed by its nerfstudio dataparser)."""
    from PIL import Image

    files = sorted(
        p for p in image_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    for d in DOWNSCALES:
        out = image_dir.parent / f"images_{d}"
        out.mkdir(exist_ok=True)
        for f in files:
            with Image.open(f) as im:
                im.resize((max(im.width // d, 1), max(im.height // d, 1)),
                          Image.BILINEAR).save(out / f.name)


def colmap_to_transforms(recon_dir: Path, output_dir: Path) -> int:
    """COLMAP model -> transforms.json (ref colmap_utils.colmap_to_json)."""
    from gaussiangrasper_tpu.data import colmap_io as cio

    cams = (
        cio.read_cameras_binary(recon_dir / "cameras.bin")
        if (recon_dir / "cameras.bin").exists()
        else cio.read_cameras_text(recon_dir / "cameras.txt")
    )
    images = (
        cio.read_images_binary(recon_dir / "images.bin")
        if (recon_dir / "images.bin").exists()
        else cio.read_images_text(recon_dir / "images.txt")
    )
    frames = []
    for im_id, im in sorted(images.items()):
        r = cio.qvec_to_rotmat(im.qvec)
        w2c = np.eye(4)
        w2c[:3, :3] = r
        w2c[:3, 3] = im.tvec
        c2w = np.linalg.inv(w2c)
        c2w[0:3, 1:3] *= -1            # OpenCV -> OpenGL
        c2w = c2w[np.array([1, 0, 2, 3]), :]  # COLMAP world -> ours
        c2w[2, :] *= -1
        frames.append({
            "file_path": f"./images/{im.name}",
            "transform_matrix": c2w.tolist(),
            "colmap_im_id": im_id,
        })
    cam = cams[min(cams)]
    fx, fy, cx, cy = cam.intrinsics()
    out = {
        "w": cam.width, "h": cam.height,
        "fl_x": float(fx), "fl_y": float(fy),
        "cx": float(cx), "cy": float(cy),
        "camera_model": "OPENCV",
        "frames": frames,
    }
    applied = np.eye(4)[:3][np.array([1, 0, 2]), :]
    applied[2, :] *= -1
    out["applied_transform"] = applied.tolist()
    (output_dir / "transforms.json").write_text(json.dumps(out, indent=4))
    return len(frames)


def process_images(data: Path, output: Path, skip_downscale: bool = False) -> None:
    output.mkdir(parents=True, exist_ok=True)
    img_out = output / "images"
    img_out.mkdir(exist_ok=True)
    if Path(data).resolve() != img_out.resolve():
        for f in sorted(Path(data).iterdir()):
            if f.suffix.lower() in (".png", ".jpg", ".jpeg"):
                shutil.copy2(f, img_out / f.name)
    if not skip_downscale:
        _downscale(img_out)
    # convert an existing reconstruction; else hint at COLMAP
    for sub in ("sparse/0", "colmap/sparse/0", "sparse"):
        recon = Path(data) / sub
        if (recon / "cameras.bin").exists() or (recon / "cameras.txt").exists():
            n = colmap_to_transforms(recon, output)
            print(f"converted COLMAP model ({n} frames) -> transforms.json")
            return
    if shutil.which("colmap") is None:
        print(
            "no COLMAP reconstruction found and no `colmap` binary on PATH; "
            "images were copied + downscaled. Provide a sparse model or use "
            "scripts/generate_data.py for RGB-D captures."
        )
    else:
        print(
            "no COLMAP reconstruction found — images were copied + "
            "downscaled WITHOUT poses. Run "
            f"`colmap automatic_reconstructor --workspace_path {output} "
            f"--image_path {output / 'images'}` and re-run this command "
            "to convert the model to transforms.json."
        )


def process_video(data: Path, output: Path, num_frames: int = 300) -> None:
    """Extract ~num_frames equally-spaced frames (the reference's
    convert_video_to_images: spacing = total // num_frames,
    process_data_utils.py)."""
    if shutil.which("ffmpeg") is None:
        raise SystemExit(
            "`ffmpeg` is not available in this image; extract frames "
            "elsewhere and run the `images` subcommand."
        )
    output.mkdir(parents=True, exist_ok=True)
    img_out = output / "images"
    img_out.mkdir(exist_ok=True)
    # extract every frame, then prune to num_frames equally spaced —
    # robust to containers where ffprobe cannot report a frame count
    subprocess.run(
        ["ffmpeg", "-i", str(data), "-vsync", "vfr",
         str(img_out / "frame_%05d.png")],
        check=True,
    )
    frames = sorted(img_out.glob("frame_*.png"))
    if len(frames) > num_frames:
        keep = set(
            np.linspace(0, len(frames) - 1, num_frames).astype(int).tolist()
        )
        for i, f in enumerate(frames):
            if i not in keep:
                f.unlink()
    process_images(img_out, output, skip_downscale=False)


def polycam_to_transforms(
    image_dir: Path, cameras_dir: Path, output_dir: Path,
    min_blur_score: float = 25.0, crop_border_pixels: int = 15,
) -> int:
    """Polycam keyframes -> transforms.json (ref polycam_utils.polycam_to_json)."""
    frames = []
    skipped = 0
    for img in sorted(image_dir.iterdir()):
        cam_json = cameras_dir / f"{img.stem}.json"
        if not cam_json.exists():
            continue
        fj = json.loads(cam_json.read_text())
        if "blur_score" in fj and fj["blur_score"] < min_blur_score:
            skipped += 1
            continue
        frame = {
            "fl_x": fj["fx"], "fl_y": fj["fy"],
            "cx": fj["cx"] - crop_border_pixels,
            "cy": fj["cy"] - crop_border_pixels,
            "w": fj["width"] - crop_border_pixels * 2,
            "h": fj["height"] - crop_border_pixels * 2,
            "file_path": f"./images/{img.name}",
            # Polycam row order -> OpenGL (ref polycam_utils.py:73-78)
            "transform_matrix": [
                [fj["t_20"], fj["t_21"], fj["t_22"], fj["t_23"]],
                [fj["t_00"], fj["t_01"], fj["t_02"], fj["t_03"]],
                [fj["t_10"], fj["t_11"], fj["t_12"], fj["t_13"]],
                [0.0, 0.0, 0.0, 1.0],
            ],
        }
        frames.append(frame)
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "transforms.json").write_text(
        json.dumps({"camera_model": "OPENCV", "frames": frames}, indent=4)
    )
    if skipped:
        print(f"skipped {skipped} frames below blur score {min_blur_score}")
    return len(frames)


def process_polycam(data: Path, output: Path, min_blur_score: float,
                    crop_border_pixels: int) -> None:
    base = Path(data)
    if (base / "keyframes").exists():
        base = base / "keyframes"
    image_dir = base / "corrected_images"
    cameras_dir = base / "corrected_cameras"
    if not image_dir.exists():
        image_dir = base / "images"
        cameras_dir = base / "cameras"
    output.mkdir(parents=True, exist_ok=True)
    img_out = output / "images"
    img_out.mkdir(exist_ok=True)
    from PIL import Image

    for f in sorted(image_dir.iterdir()):
        if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        if crop_border_pixels:
            with Image.open(f) as im:
                b = crop_border_pixels
                im.crop((b, b, im.width - b, im.height - b)).save(img_out / f.name)
        else:
            shutil.copy2(f, img_out / f.name)
    n = polycam_to_transforms(image_dir, cameras_dir, output,
                              min_blur_score, crop_border_pixels)
    print(f"wrote transforms.json with {n} frames")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Process raw captures into trainable datasets "
                    "(the ns-process-data analog)"
    )
    sub = p.add_subparsers(dest="mode", required=True)
    pi = sub.add_parser("images")
    pi.add_argument("--data", type=Path, required=True)
    pi.add_argument("--output", type=Path, required=True)
    pi.add_argument("--skip-downscale", action="store_true")
    pv = sub.add_parser("video")
    pv.add_argument("--data", type=Path, required=True)
    pv.add_argument("--output", type=Path, required=True)
    pv.add_argument("--num-frames", type=int, default=300)
    pp = sub.add_parser("polycam")
    pp.add_argument("--data", type=Path, required=True)
    pp.add_argument("--output", type=Path, required=True)
    pp.add_argument("--min-blur-score", type=float, default=25.0)
    pp.add_argument("--crop-border-pixels", type=int, default=15)
    args = p.parse_args(argv)

    if args.mode == "images":
        process_images(args.data, args.output, args.skip_downscale)
    elif args.mode == "video":
        process_video(args.data, args.output, args.num_frames)
    else:
        process_polycam(args.data, args.output, args.min_blur_score,
                        args.crop_border_pixels)


if __name__ == "__main__":
    main()
