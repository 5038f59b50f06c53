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

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import N_ORDER, NB_LIMB, NB_LIMB_D, P, TAME, WILD
from ..utils import rng as rng_mod
from ..utils.intutils import (
    int_to_limbs,
    ints_to_limbs,
    ints_to_limbs_fast,
)
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

    Drawn through rand_int_batch: identical word stream and per-lane
    composition as nb sequential Int::Rand calls, vectorized (the
    scalar loop was ~20 s of the 2^19-lane solve startup).
    """
    gen = rng if rng is not None else rng_mod._global
    nbit = range_power - 1 if symmetry else range_power
    off = (width_div2 >> 1) if symmetry else width_div2
    d = gen.rand_int_batch(nbit, nb)
    wild = (np.arange(nb) + first_type) % 2 == WILD
    d = np.where(wild, (d - off) % N_ORDER, d)
    return [int(v) for v in d]


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
    device: bool = False,
):
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
        d_modn, types, width_div2, key_point, symmetry=symmetry,
        device=device,
    )


@functools.partial(jax.jit, static_argnames=("has_key", "symmetry"))
def _positions_device(ks, wild_mask, kx, ky, *, has_key, symmetry):
    """px/py start positions for a herd, fully on device in ONE dispatch.

    ks: (16, N) scalar limbs; wild_mask: (N,) bool; kx/ky: (16, 1)
    translated-key limbs (ignored when has_key is False).  Returns
    (px, py, flip) with flip marking symmetry-normalized lanes
    (y was > p/2; the caller negates those distances).

    Round 4: this replaces ~100 eager dispatches (byte-window stack,
    the whole affine add, the sym flip loop) and two 32 MB host
    detours per herd with one compiled call -- at 2^19 lanes through
    the relay the eager form dominated the 6-25 min solve startup.
    """
    from ..ops import ec, field  # deferred: jax import cost

    n = ks.shape[1]
    sx, sy, _ = ec.scalar_mult_base_batch(ks)
    if has_key:
        # wild: keyToSearch + d*G.  acc_zero is passed as all-False so a
        # degenerate d == 0 lane runs the plain formula against (0,0),
        # matching the reference's vector AddDirect, which only
        # special-cases p1 == 0 (SECP256K1.cpp:296-298).
        kxb = jnp.broadcast_to(kx, sx.shape)
        kyb = jnp.broadcast_to(ky, sy.shape)
        ax, ay, _ = ec.affine_add_batch_masked(
            sx, sy, jnp.zeros((n,), dtype=bool),
            kxb, kyb, jnp.zeros((n,), dtype=bool),
        )
        px = jnp.where(wild_mask[None, :], ax, sx)
        py = jnp.where(wild_mask[None, :], ay, sy)
    else:
        px, py = sx, sy

    flip = jnp.zeros((n,), dtype=bool)
    if symmetry:
        # normalize into the y <= p/2 class (Kangaroo.cpp:730-734).
        # y > (p-1)/2  <=>  y + (2^256 - 1 - (p-1)/2) carries out of
        # 2^256; entry limbs are sums of two sub-2^16 digits, inside
        # the packed-carry contract.
        thr = (1 << 256) - 1 - ((P - 1) >> 1)
        t = field._fit(py, 16) + field._const_cols(
            int_to_limbs(thr), py
        )
        _, out = field._carry_exact_out(t, 16)
        flip = out == 1
        # exact p - y for flipped lanes: canonicalize(submod) returns
        # the unique canonical representative, which IS p - y
        neg_y = field.canonicalize(
            field.submod(field._const_cols(int_to_limbs(P), py), py)
        )
        py = jnp.where(flip[None, :], neg_y, py)
    return px, py, flip


def pack_device_distances(
    d_modn, types: np.ndarray, width_div2: int, symmetry: bool = False,
) -> np.ndarray:
    """Vectorized device_distance + limb packing -> (8, N) uint32.

    Object-array arithmetic on Python ints: bit-exact with the scalar
    device_distance per lane, without 10^5-scale Python loops.
    """
    d = np.array([int(v) for v in d_modn], dtype=object)
    if symmetry:
        v = d % N_ORDER
        v = np.where(v > (N_ORDER >> 1), v - N_ORDER, v)
    else:
        v = np.where(
            np.asarray(types) == WILD, (d + width_div2) % N_ORDER, d
        )
    return ints_to_limbs_fast(v & _M128, NB_LIMB_D)


def herd_from_distances(
    d_modn: List[int],
    types: np.ndarray,
    width_div2: int,
    key_point: Optional[curve.PointA],
    symmetry: bool = False,
    device: bool = False,
):
    """Starting state arrays from explicit mod-n distances and types.

    The batched core of create_herd; also used to rebuild dead
    kangaroos in ONE device dispatch per tick instead of one per lane
    (the reference resets are CreateHerd(1) calls, Kangaroo.cpp:467-471
    -- the draw order is preserved by the caller drawing d_modn
    sequentially).

    device=False returns numpy arrays (the historical contract);
    device=True returns jax device arrays for px/py (the solver's walk
    consumes them directly -- skips a 64 MB download + re-upload per
    2^19-lane herd through the relay).
    """
    nb = len(d_modn)
    types = np.asarray(types, dtype=np.uint32)
    ks = jnp.asarray(ints_to_limbs_fast(d_modn))
    wild_mask = jnp.asarray(types == WILD)

    if key_point is not None and key_point.is_zero:
        # keyToSearch is the identity (the key IS rangeStart*G): wild
        # positions degenerate to d*G, same as tame
        key_point = None
    has_key = key_point is not None and bool(np.any(types == WILD))
    if has_key:
        kx = jnp.asarray(int_to_limbs(key_point.x)[:, None])
        ky = jnp.asarray(int_to_limbs(key_point.y)[:, None])
    else:
        z16 = np.zeros((NB_LIMB, 1), dtype=np.uint32)
        kx = jnp.asarray(z16)
        ky = jnp.asarray(z16)
    px, py, flip = _positions_device(
        ks, wild_mask, kx, ky, has_key=has_key, symmetry=symmetry
    )

    if symmetry:
        flip_np = np.asarray(flip)
        if np.any(flip_np):
            d_arr = np.array([int(v) for v in d_modn], dtype=object)
            d_modn = list(np.where(flip_np, (-d_arr) % N_ORDER, d_arr))
    d_dev = pack_device_distances(
        d_modn, types, width_div2, symmetry=symmetry
    )
    if device:
        return px, py, jnp.asarray(d_dev)
    return np.asarray(px), np.asarray(py), d_dev
