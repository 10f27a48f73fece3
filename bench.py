"""Headline benchmark: pixels/s/chip, forward+backward, 800x800 render.

BASELINE.md config 2: ~200k Gaussians, RGB+depth+normal(+latent feature)
at 800x800. The reference defines throughput as rays/s = 800*800 / iter
time (/root/reference/nerfstudio/engine/trainer.py:262-270 with
full_images_datamanager.py:357-359 hardcoding 640k px/step). The reference
publishes no measured number (BASELINE.json `published: {}`); vs_baseline
is reported against an estimated 13 Mpx/s for the reference CUDA trainer
(~20 it/s at 800x800 on its target GPU class).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

N_GAUSS = 200_000
WIDTH = HEIGHT = 800
FEATURE_DIM = 32
WARMUP = 3
ITERS = 10
REFERENCE_PX_PER_S = 13e6


def build():
    from gaussiangrasper_tpu.core.cameras import Camera
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig, render

    key = jax.random.PRNGKey(0)
    field, alive = init_random(
        key, N_GAUSS, extent=4.0, feature_dim=FEATURE_DIM, init_scale=0.02
    )
    # Place the cloud in the camera frustum (OpenGL camera at origin, -z).
    field = field._replace(
        means=field.means * jnp.array([0.5, 0.5, 0.25]) + jnp.array([0.0, 0.0, -3.0])
    )
    cam = Camera.create(
        fx=1000.0, fy=1000.0, cx=WIDTH / 2, cy=HEIGHT / 2,
        camera_to_world=jnp.eye(4)[:3], width=WIDTH, height=HEIGHT,
    )
    cfg = GaussianSplatConfig(feature_dim=FEATURE_DIM)
    target = jnp.zeros((HEIGHT, WIDTH, 3))

    def fwd_bwd(field):
        def loss(f):
            out = render(f, alive, cam, 0, cfg)
            return (
                jnp.mean(jnp.abs(out["rgb"] - target))
                + jnp.mean(out["depth"]) * 0.0
                + jnp.mean(out["normal"]) * 0.0
                + jnp.mean(out["feature"]) * 0.0
            )

        l, g = jax.value_and_grad(loss)(field)
        return l, g

    return jax.jit(fwd_bwd), field


def _measure():
    step, field = build()
    for _ in range(WARMUP):
        l, g = step(field)
    jax.block_until_ready((l, g))
    # Median of per-iteration wall times, each individually synced: the
    # tunneled device has produced sporadic bogus (near-zero) batch
    # timings; per-iteration medians are robust to those flakes.
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        l, g = step(field)
        jax.block_until_ready((l, g))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    # Watchdog: the tunneled TPU in this image can wedge indefinitely (see
    # CLAUDE.md); if the measurement doesn't finish in time, emit a JSON
    # line flagging the condition instead of hanging the driver.
    import os
    import threading

    backend = jax.default_backend()
    budget_s = float(os.environ.get("GGT_BENCH_TIMEOUT", "1500"))
    result = {}

    def run():
        try:
            result["dt"] = _measure()
        except Exception as e:  # surface compile/runtime errors as a line
            result["error"] = f"{type(e).__name__}: {e}"

    worker = threading.Thread(target=run, daemon=True)
    worker.start()
    worker.join(timeout=budget_s)

    if "dt" in result:
        px_per_s = WIDTH * HEIGHT / result["dt"]
        print(
            json.dumps(
                {
                    "metric": f"pixels_per_s_per_chip_fwd_bwd_800x800_200k_{backend}",
                    "value": round(px_per_s, 1),
                    "unit": "pixels/s",
                    "vs_baseline": round(px_per_s / REFERENCE_PX_PER_S, 4),
                }
            )
        )
        os._exit(0)
    reason = result.get("error", f"device did not respond within {budget_s:.0f}s")
    print(
        json.dumps(
            {
                "metric": f"pixels_per_s_per_chip_fwd_bwd_800x800_200k_{backend}_UNAVAILABLE",
                "value": 0.0,
                "unit": "pixels/s",
                "vs_baseline": 0.0,
                "note": reason,
            }
        )
    )
    os._exit(1)


if __name__ == "__main__":
    main()
