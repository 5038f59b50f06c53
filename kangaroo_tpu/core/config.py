"""Input configuration parsing.

Reference: Kangaroo::ParseConfigFile (Kangaroo.cpp:84-144): a text file
with rangeStart hex, rangeEnd hex, then one or more public keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from . import curve


@dataclass
class ProblemConfig:
    range_start: int
    range_end: int
    keys: List[curve.PointA]


def parse_config_file(path: str) -> ProblemConfig:
    lines: List[str] = []
    with open(path, "r") as f:
        for raw in f:
            line = raw.rstrip()
            if line:
                lines.append(line)
    if len(lines) < 3:
        raise ValueError(f"{path}: not enough arguments")
    range_start = int(lines[0], 16)
    range_end = int(lines[1], 16)
    keys = []
    for i, line in enumerate(lines[2:], start=2):
        pt, _ = curve.parse_public_key_hex(line)
        keys.append(pt)
    return ProblemConfig(range_start, range_end, keys)
