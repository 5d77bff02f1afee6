"""Halo exchange for Z-slab-sharded dense grids.

The refinement's finite-difference stencils (one-sided gradients,
6-point Laplacian — Optimizer.cpp:287-393) need the first/last Z-plane of
the neighboring slab.  Exchanged with jax.lax.ppermute inside shard_map —
the voxel-grid analog of ring/context-parallel attention halos (SURVEY §5.7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def exchange_z_halo(slab: jax.Array, axis_name: str) -> Tuple[jax.Array, jax.Array]:
    """Given a local [Zl, ...] slab inside shard_map over `axis_name`,
    returns (plane_from_below, plane_from_above):

      plane_from_below: the last plane of the lower-neighbor slab (i.e. the
        plane at global index z0-1), zeros on the first shard;
      plane_from_above: the first plane of the upper-neighbor slab (global
        index z0+Zl), zeros on the last shard.
    Shapes are slab[:1] each.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    last_plane = slab[-1:]
    first_plane = slab[:1]

    # send my last plane upward (to shard i+1)
    up = jax.lax.ppermute(
        last_plane, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # send my first plane downward (to shard i-1)
    down = jax.lax.ppermute(
        first_plane, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    from_below = jnp.where(idx == 0, jnp.zeros_like(up), up)
    from_above = jnp.where(idx == n - 1, jnp.zeros_like(down), down)
    return from_below, from_above


def padded_slab(slab: jax.Array, axis_name: str, fill: float = 0.0) -> jax.Array:
    """Local slab padded with one halo plane on each Z side: [Zl+2, ...].

    Boundary shards get `fill` planes (matching the dense-grid border
    behavior where out-of-grid neighbors are clamped)."""
    below, above = exchange_z_halo(slab, axis_name)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    below = jnp.where(idx == 0, jnp.full_like(below, fill), below)
    above = jnp.where(idx == n - 1, jnp.full_like(above, fill), above)
    return jnp.concatenate([below, slab, above], axis=0)
