"""Collision resolution and key reconstruction.

Reference semantics: Kangaroo::CheckKey / CollisionCheck
(Kangaroo.cpp:218-302).  A tame/wild pair on the same x gives
k' = tameDist +- wildDist (four sign variants), checked against the
translated key and its negation; the winner is shifted back by
rangeStart.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from ..constants import N_ORDER, TAME, WILD
from . import curve


@dataclass
class SolveResult:
    private_key: int      # full private key (mod n)
    sign_info: str        # 'N' normal or 'S' symmetric (negated pubkey)
    variant: int          # which of the 4 sign variants matched


def check_key(
    d1: int,
    d2: int,
    variant: int,
    key_to_search: curve.PointA,
    key_to_search_neg: curve.PointA,
    range_start: int,
    width_div2_sym: Optional[int] = None,
) -> Optional[SolveResult]:
    """Try one sign variant (reference: CheckKey, Kangaroo.cpp:218-253).

    In symmetry mode the key was translated by rangeStart + width/2, so
    the recovered distance shifts back by the extra width/2
    (Kangaroo.cpp:234-247).
    """
    if variant & 0x1:
        d1 = (-d1) % N_ORDER
    if variant & 0x2:
        d2 = (-d2) % N_ORDER
    shift = range_start + (width_div2_sym or 0)
    pk = (d1 + d2) % N_ORDER
    pt = curve.mul(pk)
    if pt == key_to_search:
        return SolveResult((pk + shift) % N_ORDER, "N", variant)
    if pt == key_to_search_neg:
        pk = (-pk) % N_ORDER
        return SolveResult((pk + shift) % N_ORDER, "S", variant)
    return None


def collision_check(
    d1: int,
    type1: int,
    d2: int,
    type2: int,
    key_to_search: curve.PointA,
    key_to_search_neg: curve.PointA,
    range_start: int,
    width_div2_sym: Optional[int] = None,
) -> Tuple[bool, Optional[SolveResult]]:
    """Resolve a hash-table collision.

    Returns (same_herd_or_bad, result).  same-herd collisions (both
    tame or both wild) are "dead kangaroos" and the caller must reset
    the kangaroo (reference: CollisionCheck, Kangaroo.cpp:255-302).
    """
    if type1 == type2:
        return True, None

    if type1 == TAME:
        td, wd = d1, d2
    else:
        td, wd = d2, d1

    for variant in range(4):
        res = check_key(
            td, wd, variant, key_to_search, key_to_search_neg, range_start,
            width_div2_sym=width_div2_sym,
        )
        if res is not None:
            return False, res

    # Wrong collision (should not happen): caller resets the kangaroo.
    return True, None
