"""Disciplined Pallas-on-hardware attempt (CLAUDE.md wedge protocol).

Stages, each gated on the previous and individually announced so the log
shows exactly where a wedge happened:

  1. trivial elementwise kernel (the minimal Mosaic compile+run)
  2. the real composite_tiles kernel on tiny shapes
  3. composite_tiles at a bench-like tile population

Run ONLY in the background under a strict timeout:
  timeout 600 python scripts_dev/pallas_probe.py 2>&1 | tee /tmp/pallas_probe.log

If any stage hangs, the timeout kills us and the chip needs >=45 min of
being left alone (CLAUDE.md). Never run this while anything else needs
the TPU.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def announce(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage1():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    announce("stage1: submitting trivial Mosaic kernel ...")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    out.block_until_ready()
    ok = bool(jnp.allclose(out, x * 2 + 1))
    announce(f"stage1 OK (correct={ok})")
    return ok


def _tiny_tile_inputs(t=4, k=128, ts=8, c=7, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    counts = jnp.full((t,), k // 2, jnp.int32)
    xy = jax.random.uniform(ks[0], (t, k, 2)) * ts
    con = jnp.tile(jnp.array([0.5, 0.0, 0.5]), (t, k, 1))
    opac = jax.random.uniform(ks[1], (t, k)) * 0.5
    col = jax.random.uniform(ks[2], (t, k, c))
    bg = jnp.zeros((c,))
    return counts, xy, con, opac, col, bg


def stage2():
    from gaussiangrasper_tpu.ops import rasterize_pallas

    announce("stage2: compiling composite_tiles (tiny) ...")
    counts, xy, con, opac, col, bg = _tiny_tile_inputs()
    out, alpha = rasterize_pallas.composite_tiles(
        counts, xy, con, opac, col, bg, tw=2, ts=8
    )
    jax.block_until_ready((out, alpha))
    announce(f"stage2 OK out={out.shape} alpha_max={float(alpha.max()):.3f}")
    # (numerical equality vs the XLA path is covered in interpret mode by
    # tests/test_pallas.py; this stage only proves hardware compile+run)
    return True


def stage3():
    from gaussiangrasper_tpu.ops import rasterize_pallas

    announce("stage3: composite_tiles at bench-like population ...")
    counts, xy, con, opac, col, bg = _tiny_tile_inputs(t=256, k=1024,
                                                       ts=16, c=39)
    t0 = time.perf_counter()
    out, alpha = rasterize_pallas.composite_tiles(
        counts, xy, con, opac, col, bg, tw=16, ts=16
    )
    jax.block_until_ready((out, alpha))
    dt = time.perf_counter() - t0
    announce(f"stage3 first-call (compile+run) {dt:.1f}s")
    t0 = time.perf_counter()
    out, alpha = rasterize_pallas.composite_tiles(
        counts, xy, con, opac, col, bg, tw=16, ts=16
    )
    jax.block_until_ready((out, alpha))
    announce(f"stage3 steady-state {time.perf_counter() - t0:.3f}s "
             f"for 256 tiles x 1024")
    return True


def main():
    announce(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        announce("not on TPU; aborting (this probe is hardware-only)")
        return
    if not stage1():
        return
    if not stage2():
        return
    stage3()
    announce("ALL STAGES OK — Pallas compiles and runs on this tunnel")


if __name__ == "__main__":
    main()
