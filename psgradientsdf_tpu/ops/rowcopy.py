"""Indexed contiguous-row copy kernels (Pallas/Mosaic TPU).

Why this exists (round-3 finding, BASELINE.md "state-row movement"):
the culled fusion kernel (core/volume.py, re-implementing the per-voxel
update sweep of /root/reference/cpp/include/sdf_tracker/
VolumetricGradSdf.cpp:78-134 as gather -> update -> scatter over the
surviving rows) moves its volume-state rows with `jnp.take` /
`.at[idx].set`.  XLA decomposes those row-slice gathers into PER-ELEMENT
gathers: measured on v5e (bench/row_probe.py, 512^3 shapes), an indexed
[CAP, 4096] f32 row gather+scatter round-trips at 60 GB/s (47 GB/s on
the 3-D [NSEG, S, 8] view the fusion kernel uses) while the same bytes
move at 241 GB/s as contiguous slices.  These kernels move indexed
CONTIGUOUS rows with real DMAs instead:

  gather_rows(table[N,R], idx[CAP])            -> rows[CAP,R]
  scatter_rows(table[N,R], idx[CAP], rows)     -> table'   (in-place alias)

The row-index vector is scalar-prefetched (pltpu.PrefetchScalarGridSpec)
so each grid step's BlockSpec index_map can select table row idx[i]; the
kernel body is a pure VMEM copy and the Pallas pipeline double-buffers
the HBM<->VMEM DMAs.  Rows are viewed as [N, R//128, 128] tiles because
Mosaic requires a block's trailing two dims to be (8,128)-aligned or
equal to the array dims — with the full [R//128, 128] face per block the
equality branch always holds (R must be a multiple of 128; every volume
row width here is).

Semantics / caller contract (shared by the fusion call sites):
  * idx must be pre-clamped to [0, N): out-of-range behavior is
    undefined (the fusion callers clamp padding slots and neutralize
    them as described below).
  * gather: duplicate indices are fine (independent reads).
  * scatter: duplicate indices write sequentially in grid order (TPU
    grids are sequential), LAST slot wins.  The fusion callers exploit
    this for capacity padding: padding slots duplicate the FIRST active
    row and carry its exact updated content, so every write of a
    duplicated index writes identical data and order cannot matter.
    (scatter_rows_dma relaxes even the ordering: in-flight DMAs may
    race, so duplicates MUST carry identical data there.)
  * scatter donates `table` (input_output_aliases) — the caller must
    treat the argument buffer as consumed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _auto_interpret(interpret):
    """Pallas/Mosaic only lowers on TPU; CPU (the test backend) runs the
    interpreter.  None -> pick by backend so call sites stay uniform."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _tile3(n, r):
    """[N, R] rows viewed as [N, R//128, 128] Mosaic-aligned tiles."""
    assert r % 128 == 0, f"row width {r} must be a multiple of 128"
    return n, r // 128, 128


# ---------------------------------------------------------------------------
# pipelined (BlockSpec-indexed) variants
# ---------------------------------------------------------------------------


def _gather_kernel(group: int, idx_ref, *refs):
    *ins, out = refs
    for j in range(group):
        out[j] = ins[j][0]


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, *, group: int = 8,
                interpret: bool | None = None) -> jax.Array:
    """Gather rows table[idx[i], :] -> [CAP, R] via pipelined row DMAs.

    `group` rows ride one grid step (the same table is passed `group`
    times, each input's index_map picking one scalar-prefetched row
    index), amortizing per-step pipeline overhead.  CAP must be a
    multiple of `group` (fusion capacities are multiples of 512).
    """
    interpret = _auto_interpret(interpret)
    N, R = table.shape
    (CAP,) = idx.shape
    assert CAP % group == 0, (CAP, group)
    n, m, l = _tile3(N, R)
    t3 = table.reshape(n, m, l)

    def in_map(j):
        return lambda i, idx_ref: (idx_ref[i * group + j], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(CAP // group,),
        in_specs=[pl.BlockSpec((1, m, l), in_map(j)) for j in range(group)],
        out_specs=pl.BlockSpec((group, m, l), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CAP, m, l), table.dtype),
        interpret=interpret,
    )(idx, *([t3] * group))
    return out.reshape(CAP, R)


def _scatter_kernel_alias(idx_ref, table_ref, rows_ref, out_ref):
    del table_ref  # aliased storage; never read in the body
    out_ref[0] = rows_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_rows(table: jax.Array, idx: jax.Array, rows: jax.Array, *,
                 interpret: bool | None = None) -> jax.Array:
    """Write rows[i, :] into table[idx[i], :] IN PLACE (table is donated).

    One row per grid step: the output aliases the table buffer and each
    step's out BlockSpec index_map targets row idx[i]; blocks the grid
    never visits keep their prior content.
    """
    interpret = _auto_interpret(interpret)
    N, R = table.shape
    (CAP,) = idx.shape
    assert rows.shape == (CAP, R), (rows.shape, CAP, R)
    n, m, l = _tile3(N, R)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(CAP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # table (aliased, unread)
            pl.BlockSpec((1, m, l), lambda i, idx_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m, l), lambda i, idx_ref: (idx_ref[i], 0, 0)),
    )
    out = pl.pallas_call(
        _scatter_kernel_alias,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m, l), table.dtype),
        input_output_aliases={1: 0},   # operand after the scalar-prefetch arg
        interpret=interpret,
    )(idx, table.reshape(n, m, l), rows.reshape(CAP, m, l))
    return out.reshape(N, R)


# ---------------------------------------------------------------------------
# manual-DMA variants (HBM->HBM, no VMEM round trip, single grid step)
# ---------------------------------------------------------------------------

_NSEM = 16  # DMA semaphore ring depth (in-flight copies)


def _gather_dma_kernel(idx_ref, table_ref, out_ref, sem_ref):
    (CAP,) = out_ref.shape[:1]

    def copy(i):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i]], out_ref.at[i],
            sem_ref.at[jax.lax.rem(i, _NSEM)])

    def body(i, _):
        @pl.when(i >= _NSEM)
        def _():
            copy(i - _NSEM).wait()
        copy(i).start()
        return 0

    jax.lax.fori_loop(0, CAP, body, 0)

    def drain(i, _):
        copy(i).wait()
        return 0

    jax.lax.fori_loop(max(CAP - _NSEM, 0), CAP, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_dma(table: jax.Array, idx: jax.Array, *,
                    interpret: bool | None = None) -> jax.Array:
    """gather_rows via explicit HBM->HBM row DMAs (semaphore ring)."""
    interpret = _auto_interpret(interpret)
    N, R = table.shape
    (CAP,) = idx.shape
    n, m, l = _tile3(N, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
    )
    out = pl.pallas_call(
        _gather_dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CAP, m, l), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table.reshape(n, m, l))
    return out.reshape(CAP, R)


def _scatter_dma_kernel(idx_ref, table_ref, rows_ref, out_ref, sem_ref):
    del table_ref
    (CAP,) = rows_ref.shape[:1]

    def copy(i):
        return pltpu.make_async_copy(
            rows_ref.at[i], out_ref.at[idx_ref[i]],
            sem_ref.at[jax.lax.rem(i, _NSEM)])

    def body(i, _):
        @pl.when(i >= _NSEM)
        def _():
            copy(i - _NSEM).wait()
        copy(i).start()
        return 0

    jax.lax.fori_loop(0, CAP, body, 0)

    def drain(i, _):
        copy(i).wait()
        return 0

    jax.lax.fori_loop(max(CAP - _NSEM, 0), CAP, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scatter_rows_dma(table: jax.Array, idx: jax.Array, rows: jax.Array, *,
                     interpret: bool | None = None) -> jax.Array:
    """scatter_rows via explicit HBM->HBM row DMAs (semaphore ring).

    NOTE sequencing: duplicate idx entries race between in-flight DMAs —
    callers must guarantee duplicate indices carry identical row data
    (the fusion padding contract above).
    """
    interpret = _auto_interpret(interpret)
    N, R = table.shape
    (CAP,) = idx.shape
    assert rows.shape == (CAP, R)
    n, m, l = _tile3(N, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSEM,))],
    )
    out = pl.pallas_call(
        _scatter_dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, m, l), table.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table.reshape(n, m, l), rows.reshape(CAP, m, l))
    return out.reshape(N, R)
