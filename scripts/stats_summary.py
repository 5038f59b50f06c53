"""Combine stats_batch transcripts into the final STATS table.

Usage: python scripts/stats_summary.py ours1.txt [ours2.txt ...] --ref ref.txt

Parses our per-key lines (`key  N: priv=.. ops=2^.. ops/sqrtN=X dead=D`)
and the reference STATS stream (`[idx] 2^c Dead:D Avg:2^a ...`), then
prints both averages side by side.  The reference's own measured
constant (not just the 2.16 model) is the apples-to-apples target: both
implementations solved the SAME key list (fixtures/in40_200.txt).
"""

from __future__ import annotations

import math
import re
import sys

OURS = re.compile(
    r"^key\s+(\d+): priv=0x[0-9A-F]+ ops=2\^([0-9.]+) "
    r"ops/sqrtN=([0-9.]+) dead=(\d+)"
)
REF = re.compile(r"^\[\s*(\d+)\] 2\^([0-9.]+) Dead:(\d+) ")


def main() -> None:
    args = sys.argv[1:]
    ref_path = None
    if "--ref" in args:
        i = args.index("--ref")
        ref_path = args[i + 1]
        del args[i:i + 2]

    ours = {}
    dead = {}
    for path in args:
        for line in open(path, errors="replace"):
            m = OURS.match(line)
            if m:
                k = int(m.group(1))
                ours[k] = float(m.group(3))
                dead[k] = int(m.group(4))
    n = len(ours)
    avg = sum(ours.values()) / n
    davg = sum(dead.values()) / n
    print(f"ours: {n} keys  avg ops = {avg:.3f}*sqrt(N)  "
          f"dead/key = {davg:.2f}")

    if ref_path:
        ref_ops = {}
        ref_dead = {}
        for line in open(ref_path, errors="replace"):
            m = REF.match(line)
            if m:
                k = int(m.group(1))
                ref_ops[k] = 2.0 ** float(m.group(2))
                ref_dead[k] = int(m.group(3))
        sn = math.sqrt(2.0 ** 40)
        # compare on the SAME key subset both implementations solved
        common = sorted(set(ours) & set(ref_ops))
        ra = sum(ref_ops[k] for k in common) / len(common) / sn
        oa = sum(ours[k] for k in common) / len(common)
        rd = sum(ref_dead[k] for k in common) / len(common)
        od = sum(dead[k] for k in common) / len(common)
        print(f"common {len(common)} keys:")
        print(f"  reference: avg {ra:.3f}*sqrt(N)  dead/key {rd:.2f}")
        print(f"  ours:      avg {oa:.3f}*sqrt(N)  dead/key {od:.2f}")
        print(f"  ratio ours/ref = {oa / ra:.4f}")


if __name__ == "__main__":
    main()
