"""Herd creation: tame/wild kangaroo starting states.

Semantics of Kangaroo::CreateHerd (Kangaroo.cpp:670-738, no-symmetry):
  * kangaroo j (with parity offset firstType) is TAME if
    (j + firstType) %% 2 == 0 else WILD;
  * tame start distance: uniform in [0, 2^rangePower] (Int::Rand);
  * wild start distance: the same draw minus rangeWidth/2 (mod n);
  * tame position  = d * G,  wild position = keyToSearch + d * G.

Device state redesign (TPU-first, mirrors the reference GPU engine's
offset convention, GPUEngine.cu:381-433): distances are carried
on-device as 128-bit unsigned limb vectors; WILD lanes are stored with
rangeWidth/2 added so the value never goes negative.  Host code
converts back to mod-n distances when reporting DPs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..constants import N_ORDER, NB_LIMB, NB_LIMB_D, TAME, WILD
from ..utils import rng as rng_mod
from ..utils.intutils import int_to_limbs, ints_to_limbs
from . import curve


@dataclass
class HerdState:
    """Device-resident herd: positions and offset distances."""

    px: jnp.ndarray  # uint32 (16, N)
    py: jnp.ndarray  # uint32 (16, N)
    d: jnp.ndarray   # uint32 (8, N)  128-bit, wild lanes offset by W/2

    @property
    def n(self) -> int:
        return self.px.shape[1]


def draw_start_distances(
    nb: int, range_power: int, width_div2: int, first_type: int = TAME,
    rng: Optional[rng_mod.MT19937] = None, symmetry: bool = False,
) -> List[int]:
    """Mod-n start distances drawn exactly like CreateHerd.

    Symmetry mode (Kangaroo.cpp:686-693): tame in [0, N/2), wild
    centered on the translated key: rand(N/2) - N/4.
    """
    rnd = rng.rand_int if rng is not None else rng_mod.rand_int
    out = []
    for j in range(nb):
        if symmetry:
            d = rnd(range_power - 1)
            if (j + first_type) % 2 == WILD:
                d = (d - (width_div2 >> 1)) % N_ORDER
        else:
            d = rnd(range_power)
            if (j + first_type) % 2 == WILD:
                d = (d - width_div2) % N_ORDER
        out.append(d)
    return out


_M128 = (1 << 128) - 1


def device_distance(d_modn: int, ktype: int, width_div2: int,
                    symmetry: bool = False) -> int:
    """Mod-n distance -> on-device 128-bit distance.

    Plain mode: wild lanes offset by +W/2 so values stay non-negative
    (the reference GPU convention, GPUEngine.cu:381-433).  Symmetry
    mode: signed two's-complement 128-bit of the centered value (the
    walk flips distance signs, so both herds go negative).
    """
    if symmetry:
        v = d_modn % N_ORDER
        if v > N_ORDER >> 1:
            v -= N_ORDER
        return v & _M128
    if ktype == WILD:
        v = (d_modn + width_div2) % N_ORDER
    else:
        v = d_modn
    # Values beyond 2^127 mean corrupt state for in-range problems.
    return v & _M128


def true_distance(d_dev: int, ktype: int, width_div2: int,
                  symmetry: bool = False) -> int:
    """On-device distance -> mod-n distance."""
    if symmetry:
        if d_dev >> 127:
            d_dev -= 1 << 128
        return d_dev % N_ORDER
    if ktype == WILD:
        return (d_dev - width_div2) % N_ORDER
    return d_dev % N_ORDER


def create_herd(
    nb: int,
    range_power: int,
    width_div2: int,
    key_point: Optional[curve.PointA],
    first_type: int = TAME,
    rng: Optional[rng_mod.MT19937] = None,
    symmetry: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Create starting state arrays (px, py, d_device) for nb kangaroos.

    key_point is the translated search key (keyToSearch); may be None
    when only tame kangaroos are created.  Uses the batched fixed-window
    scalar multiply on device for the start positions.  Symmetry mode
    additionally normalizes each start into its equivalence class
    (y <= p/2, negating the distance on flip -- Kangaroo.cpp:730-734);
    the returned distances are signed two's-complement (see
    device_distance) and symClass starts at 0 by the normalization.
    """
    d_modn = draw_start_distances(
        nb, range_power, width_div2, first_type, rng, symmetry=symmetry
    )
    types = np.array([(j + first_type) % 2 for j in range(nb)], dtype=np.uint32)
    return herd_from_distances(
        d_modn, types, width_div2, key_point, symmetry=symmetry
    )


def herd_from_distances(
    d_modn: List[int],
    types: np.ndarray,
    width_div2: int,
    key_point: Optional[curve.PointA],
    symmetry: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Starting state arrays from explicit mod-n distances and types.

    The batched core of create_herd; also used to rebuild dead
    kangaroos in ONE device dispatch per tick instead of one per lane
    (the reference resets are CreateHerd(1) calls, Kangaroo.cpp:467-471
    -- the draw order is preserved by the caller drawing d_modn
    sequentially).
    """
    from ..ops import ec  # deferred: jax import cost

    nb = len(d_modn)
    ks = jnp.asarray(ints_to_limbs(d_modn))
    sx, sy, s_zero = ec.scalar_mult_base_batch(ks)

    types = np.asarray(types, dtype=np.uint32)
    wild_mask = jnp.asarray(types == WILD)
    if key_point is not None and key_point.is_zero:
        # keyToSearch is the identity (the key IS rangeStart*G): wild
        # positions degenerate to d*G, same as tame
        key_point = None
    if key_point is not None and bool(np.any(types == WILD)):
        kx = jnp.asarray(
            np.broadcast_to(int_to_limbs(key_point.x)[:, None], (NB_LIMB, nb))
        )
        ky = jnp.asarray(
            np.broadcast_to(int_to_limbs(key_point.y)[:, None], (NB_LIMB, nb))
        )
        # wild: keyToSearch + d*G.  acc_zero is passed as all-False so a
        # degenerate d == 0 lane runs the plain formula against (0,0),
        # matching the reference's vector AddDirect, which only
        # special-cases p1 == 0 (SECP256K1.cpp:296-298).
        ax, ay, a_zero = ec.affine_add_batch_masked(
            sx, sy, jnp.zeros((nb,), dtype=bool),
            kx, ky, jnp.zeros((nb,), dtype=bool),
        )
        px = jnp.where(wild_mask[None, :], ax, sx)
        py = jnp.where(wild_mask[None, :], ay, sy)
    else:
        px, py = sx, sy

    px_np, py_np = np.asarray(px), np.array(py)  # py: writable copy
    if symmetry:
        # normalize starts into the y <= p/2 equivalence class
        from ..constants import P
        from ..utils.intutils import limbs_to_ints_fast

        ys = limbs_to_ints_fast(py_np)
        d_modn = list(d_modn)
        for i in range(nb):
            y = int(ys[i])
            if y > P >> 1:
                py_np[:, i] = int_to_limbs(P - y)
                d_modn[i] = (-d_modn[i]) % N_ORDER

    d_dev = np.stack(
        [
            int_to_limbs(
                device_distance(dm, int(t), width_div2, symmetry=symmetry),
                NB_LIMB_D,
            )
            for dm, t in zip(d_modn, types)
        ],
        axis=1,
    )
    return px_np, py_np, d_dev
