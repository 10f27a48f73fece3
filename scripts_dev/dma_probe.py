"""Mosaic probe: dynamic-offset (unaligned) HBM<->VMEM DMA.

De-risks the pair-stream rasterizer marshaling (rasterize_pallas v3):
per-tile segment reads/writes at arbitrary row offsets into an HBM-resident
pair array via pltpu.make_async_copy. Stages (each in its own jit, strict
protocol per CLAUDE.md):
  1. aligned dynamic-offset read (offset multiple of 8)
  2. UNALIGNED dynamic-offset read (offset 3)
  3. unaligned dynamic-offset WRITE with sequential-overlap clobber order
Usage: timeout 600 python scripts_dev/dma_probe.py  (background!)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

if os.environ.get("GGT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS, KC = 4096, 128, 128  # minor dim MUST be lane-tile (128) aligned for DMA slices (HW-verified failure at 48)
INTERPRET = jax.default_backend() != "tpu"


def _read_kernel(starts_ref, hbm_ref, out_ref, scratch, sem):
    t = pl.program_id(0)
    s = starts_ref[t]
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(s, KC), :], scratch, sem,
    )
    dma.start()
    dma.wait()
    out_ref[0] = scratch[:]


def read_at(x, starts):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(starts.shape[0],),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, KC, COLS), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((KC, COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _read_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((starts.shape[0], KC, COLS),
                                       jnp.float32),
        interpret=INTERPRET,
    )(starts, x)


def _write_kernel(starts_ref, vals_ref, hbm_out_ref, scratch, sem):
    t = pl.program_id(0)
    s = starts_ref[t]
    scratch[:] = vals_ref[0]
    dma = pltpu.make_async_copy(
        scratch, hbm_out_ref.at[pl.ds(s, KC), :], sem,
    )
    dma.start()
    dma.wait()


def write_at(vals, starts, rows):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(starts.shape[0],),
        in_specs=[pl.BlockSpec((1, KC, COLS), lambda i, *_: (i, 0, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((KC, COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _write_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, COLS), jnp.float32),
        interpret=INTERPRET,
    )(starts, vals)


def main():
    x = jnp.arange(ROWS * COLS, dtype=jnp.float32).reshape(ROWS, COLS)

    for label, offs in (("aligned", [0, 8, 256]), ("UNALIGNED", [3, 77, 1001])):
        starts = jnp.asarray(offs, jnp.int32)
        out = jax.jit(read_at)(x, starts)
        jax.block_until_ready(out)
        ref = np.stack([np.asarray(x)[o:o + KC] for o in offs])
        ok = np.array_equal(np.asarray(out), ref)
        print(f"read {label}: {'OK' if ok else 'MISMATCH'}", flush=True)

    # overlapping unaligned writes, ascending starts: later grid steps
    # must win in the overlap (sequential grid order)
    offs = [0, 100, 200]
    starts = jnp.asarray(offs, jnp.int32)
    vals = jnp.stack([jnp.full((KC, COLS), float(i + 1)) for i in range(3)])
    out = jax.jit(functools.partial(write_at, rows=512))(vals, starts)
    jax.block_until_ready(out)
    a = np.asarray(out)
    ok = (a[:100] == 1).all() and (a[100:200] == 2).all() and (
        a[200:328] == 3).all()
    print(f"write UNALIGNED overlap (later wins): {'OK' if ok else 'MISMATCH'}",
          flush=True)


if __name__ == "__main__":
    main()
