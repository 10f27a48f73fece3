"""Training CLI (the `ns-train gaussian-splatting` analog, ref train.sh).

Usage:
  python -m gaussiangrasper_tpu.scripts.train --data <scene_dir> \
      [--output-dir outputs] [--max-iterations 30000] [--tensorboard]

Multi-host: call `jax.distributed.initialize()` automatically when the
JAX_COORDINATOR env vars are present; sharded stepping is selected with
--mesh dp,gauss.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a method on TPU")
    p.add_argument("--method", type=str, default="gaussian-splatting",
                   help="registered method name (see configs/methods.py; "
                        "extendable via entry points / GGT_METHOD_CONFIGS)")
    p.add_argument("--data", type=Path, required=True, nargs="+",
                   help="scene dir(s); several dirs = multi-scene batch "
                        "training with a shared EFD lift MLP")
    p.add_argument("--dataparser", type=str, default="auto",
                   help="named dataparser (colmap, nerfstudio, blender, "
                        "instant-ngp, minimal, scannet, sdfstudio, "
                        "arkitscenes, dnerf, phototourism, ...) or 'auto' "
                        "to detect from the directory layout")
    p.add_argument("--viewer-port", type=int, default=None,
                   help="serve the live training viewer on this port")
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,gauss' device mesh for sharded training "
                        "(e.g. --mesh 2,4 on 8 chips)")
    p.add_argument("--tile-shard", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="distribute each camera's compositing over the "
                        "gauss mesh axis (frustum-culled all-gather + "
                        "per-device tile bands). 'auto' = on when "
                        "gauss > 1; 'off' keeps the full-capacity-gather "
                        "step")
    p.add_argument("--output-dir", type=Path, default=Path("outputs"))
    p.add_argument("--experiment-name", type=str, default="gaussian-splatting")
    p.add_argument("--max-iterations", type=int, default=30000)
    p.add_argument("--steps-per-save", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--capacity", type=int, default=None)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--vis", type=str, default="",
                   help="extra metric backends, '+'-separated: "
                        "tensorboard, wandb, comet (missing libraries "
                        "degrade silently)")
    p.add_argument("--load-dir", type=Path, default=None)
    p.add_argument("--profiler", type=str, default="none",
                   choices=("none", "trace"),
                   help="'trace' captures an XLA device trace for steps "
                        "12..16 into <run_dir>/profiler_traces (the "
                        "reference's fixed-step profiler capture)")
    p.add_argument("--feature-dim", type=int, default=32)
    p.add_argument("--sh-degree", type=int, default=4)
    p.add_argument("--max-tiles-per-gaussian", type=int, default=None,
                   help="binning cap on tiles one splat may cover "
                        "(default 16). Splats beyond it are truncated "
                        "row-major into visible RECTANGLES (reported in "
                        "dropped_tiles); raise for high resolutions — "
                        "a 0.15-screen splat at 512^2 spans ~25-36 "
                        "tiles. Cost: the binning sort grid scales "
                        "with it.")
    p.add_argument("--warmup-length", type=int, default=500)
    p.add_argument("--refine-every", type=int, default=100)
    p.add_argument("--densify-grad-thresh", type=float, default=0.0002)
    p.add_argument("--sky-alpha-reg", type=float, default=0.0,
                   help="opt-in alpha penalty on masked-out pixels "
                        "(floater suppression for mask-gated captures; "
                        "0 = reference loss-set parity)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        import jax

        jax.distributed.initialize()

    from gaussiangrasper_tpu.configs import get_method

    get_method(args.method)(args)


if __name__ == "__main__":
    main()
