"""Round-5 reference-scale convergence run (VERDICT r4 #3).

Runs the PRODUCTION CLI on the ray-traced tabletop at 512^2 in resumable
chunks, then reports held-out masked eval PSNR/SSIM via scripts/render.py
against an interleaved-phase eval capture (same identity world frame).

Usage (each invocation = one resumable chunk; run under timeout in the
background per the TPU protocol):

    timeout 1700 python scripts_dev/r5_convergence.py --until 5000
    timeout 1700 python scripts_dev/r5_convergence.py --until 10000
    ...
    timeout 1700 python scripts_dev/r5_convergence.py --eval-only

State lives under /tmp/ggt_r5_run (override with --workdir). The train
capture is 10 views at phase 0; eval is 5 views at phase pi/10 and a
slightly different orbit height — never trained on.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

WH = 512
TRAIN_VIEWS = int(__import__("os").environ.get("GGT_CONV_VIEWS", "10"))
EVAL_VIEWS = int(__import__("os").environ.get("GGT_CONV_EVAL_VIEWS", "5"))
CAPACITY = int(__import__("os").environ.get("GGT_CONV_CAP", "131072"))
SEED_POINTS = 20000
TRAIN_HEIGHTS = [float(x) for x in __import__("os").environ.get(
    "GGT_CONV_HEIGHTS", "1.4").split(",")]
EVAL_HEIGHT = float(__import__("os").environ.get("GGT_CONV_EVAL_H", "1.55"))
MT = int(__import__("os").environ.get("GGT_CONV_MT", "0"))
SKY = float(__import__("os").environ.get("GGT_CONV_SKY", "0"))


def ensure_data(workdir: Path):
    import numpy as np

    train_dir = workdir / "scene"
    eval_dir = workdir / "scene_eval"
    if not (train_dir / "transforms.json").exists():
        from gaussiangrasper_tpu.data.synthetic import generate_tabletop

        generate_tabletop(train_dir, width=WH, height=WH,
                          n_views=TRAIN_VIEWS, feature_downscale=4,
                          seed_points=SEED_POINTS,
                          view_height=TRAIN_HEIGHTS)
        generate_tabletop(eval_dir, width=WH, height=WH,
                          n_views=EVAL_VIEWS, feature_downscale=4,
                          seed_points=64,
                          view_phase=float(np.pi / TRAIN_VIEWS),
                          view_height=EVAL_HEIGHT)
        generate_tabletop(workdir / "scene_eval_ring", width=WH, height=WH,
                          n_views=EVAL_VIEWS, feature_downscale=4,
                          seed_points=64,
                          view_phase=float(np.pi / TRAIN_VIEWS),
                          view_height=sum(TRAIN_HEIGHTS) / len(TRAIN_HEIGHTS))
        print("data generated", flush=True)
    return train_dir, eval_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=Path, default=Path("/tmp/ggt_r5_run"))
    p.add_argument("--until", type=int, default=5000,
                   help="cumulative step target for this chunk")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--eval-step", type=int, default=None)
    p.add_argument("--eval-data", type=str, default="scene_eval_ring",
                   help="eval capture subdir (scene_eval_ring = on-ring "
                        "interleaved phase, the reference's protocol; "
                        "scene_eval = off-ring stress views)")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--capacity", type=int, default=CAPACITY)
    p.add_argument("--grow-to", type=int, default=None,
                   help="grow the latest checkpoint's capacity to N and "
                        "exit (resume the next chunk with --capacity N)")
    args = p.parse_args()

    workdir = args.workdir
    workdir.mkdir(parents=True, exist_ok=True)
    train_dir, eval_dir = ensure_data(workdir)
    eval_dir = workdir / args.eval_data
    out = workdir / "runs"
    run_dir = out / "tabletop512"
    ckpt_dir = run_dir / "checkpoints"

    if args.grow_to is not None:
        import json as _json

        from gaussiangrasper_tpu.engine import checkpoint as ckpt
        from gaussiangrasper_tpu.engine.train_state import grow_capacity
        from gaussiangrasper_tpu.scripts.common import load_run

        _, _, state = load_run(run_dir)
        state = grow_capacity(state, args.grow_to)
        path = ckpt.save_checkpoint(ckpt_dir, state)
        cfg_path = run_dir / "config.json"
        payload = _json.loads(cfg_path.read_text())
        payload["capacity"] = args.grow_to
        cfg_path.write_text(_json.dumps(payload, indent=2))
        print(f"capacity grown to {args.grow_to}; saved {path}")
        return

    if not args.eval_only:
        cmd = [
            sys.executable, "-m", "gaussiangrasper_tpu.scripts.train",
            "--data", str(train_dir), "--output-dir", str(out),
            "--experiment-name", "tabletop512",
            "--max-iterations", str(args.until),
            "--steps-per-save", "1000",
            "--capacity", str(args.capacity),
        ]
        if MT:
            cmd += ["--max-tiles-per-gaussian", str(MT)]
        if SKY:
            cmd += ["--sky-alpha-reg", str(SKY)]
        if ckpt_dir.exists() and any(ckpt_dir.iterdir()):
            cmd += ["--load-dir", str(ckpt_dir)]
        print("RUN:", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            sys.exit(r.returncode)

    if args.no_eval:
        return
    # held-out eval via the production render CLI
    eval_out = workdir / f"eval_{args.eval_step or 'latest'}"
    cmd = [
        sys.executable, "-m", "gaussiangrasper_tpu.scripts.render",
        "--run-dir", str(run_dir), "--data", str(eval_dir),
        "--num-views", str(EVAL_VIEWS), "--output", str(eval_out),
    ]
    if args.eval_step is not None:
        cmd += ["--step", str(args.eval_step)]
    print("EVAL:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        sys.exit(r.returncode)
    metrics = json.loads((eval_out / "metrics.json").read_text())["results"]
    print("HELD-OUT EVAL:", json.dumps(
        {k: v for k, v in metrics.items() if k != "per_view"}), flush=True)


if __name__ == "__main__":
    main()
