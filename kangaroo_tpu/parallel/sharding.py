"""Multi-device herd sharding (SPMD over a jax.sharding.Mesh).

The reference scales by giving every GPU its own kangaroo herd and
funnelling distinguished points to one central hash table
(Kangaroo.cpp:1041-1047, Network.cpp).  The TPU-native equivalent is a
single logical herd sharded over the lane axis of a device mesh: every
device advances its shard with the same fused jump kernel, DP capture
stays per-lane, and the host drains hits after each tick.  There is no
cross-device communication in the hot loop at all -- the walk is
embarrassingly parallel; the only global object is the host-side hash
table (or, distributed, the DP server).

Axis layout: state arrays are (L, N) with lanes last, so the mesh axis
shards dim 1.  Jump tables and DP masks are replicated (they are tiny
and read-only).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import jump_ref

HERD_AXIS = "herd"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (HERD_AXIS,))


def herd_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (L, N) herd state: lanes split across the mesh."""
    return NamedSharding(mesh, P(None, HERD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_herd(mesh: Mesh, px, py, d):
    """Place herd state on the mesh, sharded over lanes."""
    s = herd_sharding(mesh)
    return (
        jax.device_put(px, s),
        jax.device_put(py, s),
        jax.device_put(d, s),
    )


def make_sharded_jump_steps(
    mesh: Mesh, nb_run: int, inv_stop: int = 1024, backend: str = "xla",
    block: int = 0, symmetry: bool = False, slots: int = 2,
):
    """Compile the multi-jump tick as an SPMD program over the mesh.

    Returns fn(px, py, d, jx, jy, jd, masks[, symclass]) with the
    contract of jump_ref.jump_steps_with_dp; inputs must be placed with
    shard_herd (state) / replicated (tables).  Every device runs the
    kernel on its lane shard; no collectives are needed (DP drain
    happens on host).
    """
    from jax import shard_map

    def local_step(px, py, d, jx, jy, jd, masks, symclass):
        if backend == "pallas":
            from ..ops import jump_pallas

            # block=0/None: the kernel picks its VMEM-aware default
            return jump_pallas.jump_steps_with_dp(
                px, py, d, jx, jy, jd, masks, nb_run=nb_run,
                block=(block or None),
                symmetry=symmetry, symclass=symclass, slots=slots,
            )
        return jump_ref.jump_steps_with_dp(
            px, py, d, jx, jy, jd, masks, nb_run=nb_run,
            inv_stop=inv_stop, symmetry=symmetry, symclass=symclass,
            slots=slots,
        )

    state = P(None, HERD_AXIS)
    repl = P(None, None)
    out_specs = (
        state, state, state, P(HERD_AXIS),
        P(None, None, HERD_AXIS), P(None, None, HERD_AXIS),
        P(None, HERD_AXIS),
    )
    if symmetry:
        out_specs = out_specs + (P(HERD_AXIS),)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            state, state, state, repl, repl, repl, P(None), P(HERD_AXIS)
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)
