"""Single-host solver orchestrator.

TPU-native counterpart of Kangaroo::Run + SolveKeyGPU
(Kangaroo.cpp:334-506,510-644,913-1083): the herd lives on device; each
tick runs a fused multi-jump kernel, DPs are compacted and brought back
to the host, inserted into the hash table, and collisions resolved
exactly like the reference.
"""

from __future__ import annotations

import math
import threading
import time
from dataclasses import dataclass, field as dc_field
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import N_ORDER, TAME, WILD
from ..utils import rng as rng_mod
from ..utils.intutils import (
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints_fast,
)
from . import curve, herd as herd_mod
from .collision import collision_check
from .config import ProblemConfig
from .hashtable import (
    ADD_COLLISION,
    ADD_DUPLICATE,
    ADD_OK,
    HashTable,
    NativeHashTable,
    calc_dist_and_type,
    make_hash_table,
)
from .jumptable import JumpTable, create_jump_table


@dataclass
class SolverOptions:
    nb_kangaroo: int = 1 << 14     # herd lanes on device
    dp_size: int = -1              # -1: auto (suggested DP)
    # Host+transfer cost per drained DP used by the auto-DP model
    # (see KangarooSolver.DP_HOST_COST); co-located deployments where
    # the relay tax vanishes should pass ~1e-6 (-dpcost on the CLI)
    dp_cost: float = -1.0          # -1: stack default
    nb_run: int = 16               # jumps per device tick (0 = auto)
    max_step: float = 0.0          # abort after max_step*expected ops (0: never)
    seed: Optional[int] = None     # herd RNG seed (None: time seed)
    backend: str = ""              # '', 'xla' or 'pallas' ('' = auto)
    out_file: str = ""             # append solved keys
    quiet: bool = False
    # Checkpointing (reference -w / -wi / -ws)
    work_file: str = ""
    save_period: int = 60
    save_kangaroo: bool = False
    split_work_file: bool = False
    # -wt: max seconds to wait for a still-running background save
    # before skipping this interval (reference wtimeout, default 3000ms)
    save_timeout: float = 3.0
    # Equivalence-class walk over {P, -P}: ~sqrt(2) fewer expected ops
    # (reference USE_SYMMETRY, off by default -- Constants.h:24-25)
    symmetry: bool = False
    # Devices of the local mesh to shard the herd over (0 = all).  The
    # walk is embarrassingly parallel: each device advances its lane
    # shard, DPs drain to the single host table (SURVEY.md 2.11).
    n_devices: int = 0
    # fixed hit-gather width (0 = auto from the expected DP rate);
    # hits beyond it are pulled in chunks of the same width
    pull_pad: int = 0
    # Launch windows fused into ONE device dispatch (lax.scan over the
    # jump kernel, DP slots stacked per window).  Each host round trip
    # costs ~0.6 s through a remote-device relay; fusing K windows
    # divides that overhead by K without changing the walk.  0 = auto:
    # extends the auto launch window past the per-window cap (engaged
    # only when nb_run is auto too).
    windows_per_tick: int = 0
    # Device watchdog: if a host read of device results blocks longer
    # than this many seconds (hung accelerator/relay), checkpoint the
    # hash table to the work file and abort the solve instead of
    # hanging forever.  0 disables.  Table-only resume costs DP
    # overhead only (reference README.md:99-101).
    device_timeout: float = 600.0
    # Device-side DP compaction (round 5): the tick's capture slots are
    # compacted ON DEVICE (cumsum over occupancy + position scatter +
    # payload gather) so the host makes ONE blocking read per tick
    # instead of counts-read -> index-upload -> gather-read.  The old
    # 3-round-trip path remains as the overflow fallback and behind
    # compact=False.
    compact: bool = True


@dataclass
class SolveStats:
    count: int = 0
    dead: int = 0
    time: float = 0.0
    expected_ops: float = 0.0
    # DP hits beyond the per-lane capture slots in one launch window
    # (reference warns on its bounded output ring, GPUEngine.cu:641-648)
    lost: int = 0


class DeviceHangError(RuntimeError):
    """A host read of device results exceeded the watchdog timeout."""


# Per-lane DP capture slots are bounded (VMEM rows scale with the slot
# count); beyond this many the launch window is split instead.
MAX_SLOTS = 8
# Target probability of losing ANY DP in one launch window (summed
# over all lanes).  The reference treats its output-ring overflow as an
# operator warning (GPUEngine.cu:641-648); sizing the slots from the
# Poisson tail makes loss a ~never event instead of a tuning accident.
DP_LOSS_TARGET = 1e-4


def poisson_tail(lam: float, k: int) -> float:
    """P(Pois(lam) >= k), direct pmf sum (accurate for tiny tails where
    1 - cdf would lose precision)."""
    if lam <= 0.0:
        return 0.0
    if k <= 0:
        return 1.0
    if k <= lam:
        # below/at the mode the tail is >= ~0.5; returning the bound 1.0
        # short-circuits the series, whose leading term exp(-lam + ...)
        # underflows to 0.0 for lam >= ~745 and silently reported a
        # ZERO tail for misconfigurations like -nbrun 1024 -d 0 (the
        # sizing loop then picked minimal slots while virtually every
        # DP overflowed the capture slots)
        return 1.0
    logp = -lam + k * math.log(lam) - math.lgamma(k + 1)
    term = math.exp(logp)
    total = 0.0
    for j in range(400):
        total += term
        term *= lam / (k + j + 1)
        if term < total * 1e-12 + 1e-300:
            break
    return total


def slots_for_window(nb_run: int, dp_size: int, n_lanes: int,
                     target: float = DP_LOSS_TARGET) -> int:
    """Smallest slot count s with n_lanes * P(Pois(lam) > s) <= target,
    lam = nb_run / 2^dp (expected DP hits per lane per launch window).

    Floor 2: the 2-slot geometry is the cheapest the kernel ships and
    covers any sane window for free.
    """
    lam = nb_run / float(1 << dp_size)
    s = 2
    while n_lanes * poisson_tail(lam, s + 1) > target and s < 64:
        s += 1
    # round up to even: each slot count is a distinct kernel compile
    # (minutes through the remote compile service), so halving the
    # number of reachable configurations is worth one spare slot
    return s + (s & 1)


class KangarooSolver:
    """Holds range/key state and drives the device herd."""

    def __init__(self, cfg: ProblemConfig, opts: SolverOptions):
        self.cfg = cfg
        self.opts = opts
        # Herd lanes snap to the kernel's lane quantum, the same way the
        # reference snaps its kangaroo census to the GPU grid geometry
        # (GetGridSize/SetKangaroos, Kangaroo.cpp:946-961): blocks must
        # tile the herd, so -nk rounds UP to a multiple of 128 (or to
        # even, below 128, preserving the tame/wild lane parity split).
        nk = opts.nb_kangaroo
        q = 128 if nk >= 128 else 2
        if nk % q:
            opts.nb_kangaroo = nk + (q - nk % q)
            if not opts.quiet:
                print(
                    f"Warning: -nk {nk} rounded up to "
                    f"{opts.nb_kangaroo} (herd lanes snap to "
                    f"multiples of {q})"
                )
        self.hash_table = make_hash_table()
        self.stats = SolveStats()
        self.key_idx = 0
        self.end_of_search = False
        # offsets restored from a loaded work file
        self.offset_count = 0
        self.offset_time = 0.0
        self.loaded_kangaroos = None
        # resume marker: when True, solve() keeps the already-loaded
        # hash table instead of resetting it (reference: LoadWork then
        # Run keeps the table, Backup.cpp:149-207)
        self.resumed = False
        self._lost_warned = False
        self._init_range()

    # -- range / key init (reference: InitRange, Kangaroo.cpp:877-890) --
    def _init_range(self):
        self.range_start = self.cfg.range_start
        self.range_end = self.cfg.range_end
        self.range_width = self.range_end - self.range_start
        self.range_power = self.range_width.bit_length()
        self.width_div2 = self.range_width >> 1

    def init_search_key(self, key_idx: int):
        """Translate the key by rangeStart (reference: Kangaroo.cpp:892-909).

        Symmetry mode recenters on the middle of the range
        (+rangeWidth/2) so wild distances straddle zero.
        """
        self.key_idx = key_idx
        key = self.cfg.keys[key_idx]
        sp = self.range_start % N_ORDER
        if self.opts.symmetry:
            sp = (sp + self.width_div2) % N_ORDER
        if sp != 0:
            rs = curve.mul(sp).neg()
            self.key_to_search = curve.add(key, rs)
        else:
            self.key_to_search = key
        self.key_to_search_neg = self.key_to_search.neg()

    # -- expected work model (reference: ComputeExpected, :836-873) -----
    def compute_expected(self, dp: float, nb_kangaroo: Optional[int] = None):
        k = float(nb_kangaroo or self.opts.nb_kangaroo)
        n = 2.0 ** self.range_power
        theta = 2.0 ** dp
        gain_s = 1.0 / math.sqrt(2.0) if self.opts.symmetry else 1.0
        z0 = (2.0 * (2.0 - math.sqrt(2.0)) * gain_s) * math.sqrt(math.pi)
        avg_dp0 = z0 * math.sqrt(n)
        op = z0 * (n * (k * theta + math.sqrt(n))) ** (1.0 / 3.0)
        # RAM model with the reference's C struct sizes (bytes):
        # HASH_ENTRY=16, ENTRY*=8, ENTRY=32 (Kangaroo.cpp:864-868).
        from ..constants import HASH_SIZE

        ram = 16.0 * HASH_SIZE + 8.0 * (HASH_SIZE * 4) + (32.0 + 8.0) * (op / theta)
        ram /= 1024.0 * 1024.0
        overhead = op / avg_dp0
        return op, ram, overhead

    def suggest_dp(self, nb_kangaroo: int) -> int:
        """Reference auto-DP heuristic (Kangaroo.cpp:980-996)."""
        s = int(self.range_power / 2.0 - math.log2(float(nb_kangaroo)))
        if s < 0:
            s = 0
        _, _, overhead = self.compute_expected(float(s), nb_kangaroo)
        while overhead > 1.05 and s > 0:
            s -= 1
            _, _, overhead = self.compute_expected(float(s), nb_kangaroo)
        return s

    # Host-side cost of one DP (decode + table insert + device-link
    # transfer).  With the flat per-DP gather (round 4) each captured
    # DP ships exactly 38 packed bytes and inserts natively (~0.3 us);
    # through the axon relay the transfer prices at ~1-2 us/DP (the
    # round-3 slot-plane gather shipped ~6x that and baked 8e-6 here,
    # which oversized dp by 1-3 bits).  Co-located deployments can
    # pass dp_cost=1e-6 via -dpcost.
    DP_HOST_COST = 2e-6

    @staticmethod
    def _bench_rate() -> Optional[float]:
        """Measured kernel rate (K/s) from the newest BENCH_r*.json.

        The auto-DP model needs a rate prior; a hardcoded constant
        drifts every time the kernel gets faster (it lagged 1.5e8 vs a
        measured 1.71e8 by round 4), so read the committed bench
        artifact instead and fall back to a constant only when absent.
        """
        import glob
        import json
        import pathlib

        root = pathlib.Path(__file__).resolve().parents[2]
        best = None
        for pat in (root, pathlib.Path.cwd()):
            for f in glob.glob(str(pat / "BENCH_r*.json")):
                try:
                    with open(f) as fh:
                        v = json.load(fh)
                    # driver artifacts wrap the metric line in "parsed"
                    v = v.get("parsed", v)
                    if v.get("unit") == "MK/s" and v.get("value"):
                        key = f  # lexicographic = round order (r01..)
                        if best is None or key > best[0]:
                            best = (key, float(v["value"]) * 1e6)
                except (OSError, ValueError, KeyError):
                    continue
        return best[1] if best else None

    def balanced_dp(self, nb_kangaroo: int, rate: Optional[float] = None,
                    suggested: Optional[int] = None,
                    dp_cost: float = DP_HOST_COST) -> int:
        """Auto-DP with the host drain in the cost model.

        The reference minimizes expected ops alone (its hash insert is
        ~100 ns, Kangaroo.cpp:980-996); here every DP also pays the
        vectorized drain path, so small ranges with small dp can become
        drain-bound.  Minimize
            T(dp) = expected_ops(dp) * (1/rate + dp_cost / 2^dp)
        over dp >= the reference suggestion.
        """
        if rate is None:
            import jax

            if jax.devices()[0].platform == "tpu":
                rate = self._bench_rate() or 1.7e8
            else:
                rate = 3.5e6
        s = self.suggest_dp(nb_kangaroo) if suggested is None else suggested
        best, best_t = s, None
        for dp in range(s, min(s + 24, 65)):
            op, _, _ = self.compute_expected(float(dp), nb_kangaroo)
            t = op * (1.0 / rate + dp_cost / float(1 << dp))
            if best_t is None or t < best_t:
                best, best_t = dp, t
        return best

    # -- main loop ------------------------------------------------------
    def solve(
        self,
        key_idx: int = 0,
        progress: Optional[Callable] = None,
        max_ticks: Optional[int] = None,
        dp_sink: Optional[Callable] = None,
        save_hook: Optional[Callable] = None,
    ):
        """Solve one key.  Returns SolveResult or None (abort)."""
        from ..ops import jump_ref
        from ..ops.ec import affine_add_batch_masked  # noqa: F401 (warm import)

        opts = self.opts
        self.init_search_key(key_idx)

        jt = create_jump_table(self.range_power, symmetry=opts.symmetry)
        jx_np, jy_np, jd_np = jt.as_arrays()
        jx, jy, jd = jnp.asarray(jx_np), jnp.asarray(jy_np), jnp.asarray(jd_np)

        dp_size = opts.dp_size
        if dp_size < 0:
            dp_size = self.balanced_dp(
                opts.nb_kangaroo,
                dp_cost=(opts.dp_cost if opts.dp_cost >= 0.0
                         else self.DP_HOST_COST),
            )
        self.dp_size = dp_size
        auto_window = opts.nb_run == 0
        if auto_window:
            # auto launch window: as long as possible (host and relay
            # overhead amortize over the window), floor 64 -- small-dp
            # runs raise the capture slot count instead of shrinking
            # the window (tiny windows made the 56-bit solve
            # host-bound at 6 MK/s vs the 88 MK/s kernel)
            opts.nb_run = max(64, min(1024, 1 << max(0, dp_size - 3)))
        # Capture slots sized so P(losing any DP in one window) <=
        # DP_LOSS_TARGET over the Poisson tail of hits per lane; when
        # the budget would exceed MAX_SLOTS (small dp => high hit
        # rate), SPLIT the window instead -- fused dispatch below keeps
        # the host round trips amortized.  (Round-3 sized slots from a
        # coarse lam table and lost 40/166 DPs on the hardware solves.)
        n_slots = slots_for_window(opts.nb_run, dp_size, opts.nb_kangaroo)
        while n_slots > MAX_SLOTS and auto_window and opts.nb_run > 8:
            opts.nb_run //= 2
            n_slots = slots_for_window(
                opts.nb_run, dp_size, opts.nb_kangaroo
            )
        slots_capped = n_slots > MAX_SLOTS
        if slots_capped:
            # explicit -nbrun pinned the window: cap and report the
            # residual expected loss instead of silently dropping
            n_slots = MAX_SLOTS
            if not opts.quiet:
                lam = opts.nb_run / float(1 << dp_size)
                exp_loss = opts.nb_kangaroo * poisson_tail(
                    lam, MAX_SLOTS + 1
                )
                print(
                    f"Warning: DP capture slots capped at {MAX_SLOTS} "
                    f"(expected ~{exp_loss:.2g} lost DPs per launch "
                    f"window); lower -nbrun or raise -d to eliminate "
                    f"loss"
                )
        kw = opts.windows_per_tick
        if kw == 0:
            # auto: fuse whole windows into one dispatch until it
            # carries ~4096 steps (the slot budget is per window, so
            # overflow odds are unchanged; stacked slots live in HBM).
            # Rationale: each tick pays ~0.5-0.6 s of host/relay round
            # trips regardless of size (measured on the 56-bit solve:
            # 67 MK/s wall vs 153 MK/s kernel at 512-step dispatches),
            # so the dispatch must carry seconds of kernel work.  Only
            # when the window itself was auto: an explicit -nbrun pins
            # the dispatch granularity too.  The stacked DP slots of a
            # fused dispatch live in HBM until drained: bound them to
            # ~2 GB so deep fusion of split windows cannot blow memory.
            if auto_window:
                kw = max(1, min(16, 4096 // opts.nb_run))
                slot_bytes = (
                    n_slots * (jump_ref.DPX_ROWS + 8 + 1) * 4
                    * opts.nb_kangaroo
                )  # dpx DPX_ROWS + dpd 8 + step 1 rows per slot
                kw = max(1, min(kw, int(2e9 / max(1, slot_bytes))))
            else:
                kw = 1
        self.stats.expected_ops, _, _ = self.compute_expected(
            float(dp_size), opts.nb_kangaroo
        )
        dp_masks = jnp.asarray(jump_ref.dp_limb_masks(dp_size))

        rng = rng_mod.MT19937(
            opts.seed if opts.seed is not None else (time.time_ns() & 0xFFFFFFFF)
        )

        result = None
        tick = 0
        n = opts.nb_kangaroo

        inv_stop = min(1024, n)

        backend = opts.backend
        if not backend:
            backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"

        devices = jax.devices()
        nd = opts.n_devices or len(devices)
        nd = min(nd, len(devices), opts.nb_kangaroo)
        while nd > 1 and opts.nb_kangaroo % nd:
            nd -= 1  # lane shards must divide the herd evenly
        mesh = None
        if nd > 1:
            # shard the herd over the local mesh; tables replicated
            from ..parallel import sharding as sharding_mod
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            mesh = sharding_mod.make_mesh(devices[:nd])
            repl = sharding_mod.replicated(mesh)
            jx, jy, jd = (jax.device_put(a, repl) for a in (jx, jy, jd))
            dp_masks = jax.device_put(dp_masks, repl)
            sharded_tick = sharding_mod.make_sharded_jump_steps(
                mesh, nb_run=opts.nb_run,
                inv_stop=min(inv_stop, opts.nb_kangaroo // nd),
                backend=backend, symmetry=opts.symmetry, slots=n_slots,
            )

            def base_tick(px, py, d, sc, tjx, tjy, tjd, tmask):
                return sharded_tick(px, py, d, tjx, tjy, tjd, tmask, sc)
        elif backend == "pallas":
            from ..ops import jump_pallas

            def base_tick(px, py, d, sc, tjx, tjy, tjd, tmask):
                # block=None: the kernel picks the default with its
                # VMEM-aware demotion (slots/symmetry geometry)
                return jump_pallas.jump_steps_with_dp(
                    px, py, d, tjx, tjy, tjd, tmask,
                    nb_run=opts.nb_run,
                    symmetry=opts.symmetry, symclass=sc, slots=n_slots,
                )
        else:
            def base_tick(px, py, d, sc, tjx, tjy, tjd, tmask):
                return jump_ref.jump_steps_with_dp(
                    px, py, d, tjx, tjy, tjd, tmask,
                    nb_run=opts.nb_run, inv_stop=inv_stop,
                    symmetry=opts.symmetry, symclass=sc, slots=n_slots,
                )

        if kw > 1:
            # Fuse kw launch windows into one dispatch: lax.scan over
            # the per-window tick, DP outputs stacked on a leading
            # window axis.  One host round trip then covers kw windows
            # (the relay RTT is the solve loop's main overhead; the
            # walk itself is bit-identical to kw separate ticks).
            # The jump tables / dp masks enter as ARGUMENTS, not
            # captured constants: baked-in table values made the
            # compiled executable range- and dp-specific, so every new
            # range recompiled the fused tick (~10 min; observed on
            # the 76-bit solve after a cached 72-bit one).
            sym = opts.symmetry

            @jax.jit
            def fused_tick(px, py, d, sc, tjx, tjy, tjd, tmask):
                def body(carry, _):
                    px, py, d, sc = carry
                    o = base_tick(px, py, d, sc, tjx, tjy, tjd, tmask)
                    sc2 = o[7] if sym else sc
                    return (o[0], o[1], o[2], sc2), (o[3], o[4], o[5], o[6])

                (px, py, d, sc), st = jax.lax.scan(
                    body, (px, py, d, sc), None, length=kw
                )
                out = (px, py, d) + tuple(st)
                if sym:
                    out = out + (sc,)
                return out
        else:
            fused_tick = base_tick

        def tick_fn(px, py, d, sc):
            return fused_tick(px, py, d, sc, jx, jy, jd, dp_masks)

        sink_end = False

        # One fixed gather width for the whole solve: a varying (or
        # laddered) width would compile a fresh gather per new size --
        # ~30-90 s each through a remote compile service.  Snug sizing
        # (round 4): 1.15x the expected hits rounded to a 4096
        # multiple, not the next power of two -- the pow2 ladder
        # shipped up to 2x dead padding per tick through the relay
        # (transfer scales with the pad, and the pad is the payload).
        # 15% is ~150 Poisson sigmas at production DP rates; the rare
        # overflow tick gathers in chunks of the same width.
        exp_hits = n * opts.nb_run * kw / float(1 << dp_size)
        pull_pad = opts.pull_pad or min(
            max(128, int(math.ceil((1.15 * exp_hits + 64) / 4096)) * 4096),
            n,
        )

        # One fused gather dispatch per tick over FLAT (window, slot,
        # lane) DP positions: the host reads the per-lane counts, lists
        # the occupied slot cells, and the device ships exactly one
        # 38-byte column per captured DP.  (The previous layout gathered
        # ALL slot planes for every hit lane: at 6 slots and dp 14 that
        # moved ~60 MB/tick through the device link when ~5 MB of real
        # DPs existed -- the link, not the kernel, set the 72-bit solve
        # rate.)  Only the x limbs the table needs travel: stored X is
        # the low 128 bits and the bucket is bits 128..145
        # (HashTable.cpp:75-100), i.e. limbs 0..9.
        XR = jump_ref.DPX_ROWS  # captured x rows (x128 + bucket bits)

        @jax.jit
        def gather_fn(dpx, dpd, dp_step, flat_idx):
            if kw > 1:
                # stacked (kw, slots*R, n) windows -> (R, kw*slots*n)
                dpx = dpx.reshape(kw, n_slots, XR, n)
                dpd = dpd.reshape(kw, n_slots, 8, n)
                xg = jnp.moveaxis(dpx, 2, 0).reshape(XR, kw * n_slots * n)
                dg = jnp.moveaxis(dpd, 2, 0).reshape(8, kw * n_slots * n)
                sf = dp_step.reshape(kw * n_slots * n)
            else:
                xg = dpx.reshape(n_slots, XR, n).swapaxes(0, 1).reshape(
                    XR, n_slots * n
                )
                dg = dpd.reshape(n_slots, 8, n).swapaxes(0, 1).reshape(
                    8, n_slots * n
                )
                sf = dp_step.reshape(n_slots * n)
            xg = jnp.take(xg, flat_idx, axis=1)
            dg = jnp.take(dg, flat_idx, axis=1)
            sg = jnp.take(sf, flat_idx)
            # halve the payload further: the limb rows hold 16-bit
            # values in u32 lanes, so pack row pairs before transfer
            xp = xg[0::2] | (xg[1::2] << 16)   # (5, P)
            dp2 = dg[0::2] | (dg[1::2] << 16)  # (4, P)
            return xp, dp2, sg.astype(jnp.uint16)    # steps < nb_run

        @jax.jit
        def pack_counts(count):
            # nibble-packed counts: halves the per-tick blocking
            # readback (the largest fixed transfer of the loop).  The
            # lost-DP counter saturates at 15 hits/lane/window -- the
            # slot budget is <= 8 by the window-split rule, and
            # P(>15 Poisson hits) at any sane DP rate is ~1e-30.
            # When the Poisson sizing was overridden (pinned -nbrun
            # capped the slot budget) the >15 tail is NOT negligible:
            # read full u8 counts so stats.lost stays honest.
            if slots_capped:
                return jnp.minimum(count.reshape(-1), 255).astype(jnp.uint8)
            c = jnp.minimum(count.reshape(-1), 15).astype(jnp.uint8)
            return c[0::2] | (c[1::2] << 4)

        C_CELLS = kw * n_slots * n

        @jax.jit
        def compact_fn(count, dpx, dpd, dp_step):
            """Device-side DP compaction: ship exactly the occupied
            slot cells, in cell order, with their flat positions.

            cumsum over per-cell occupancy -> one 1-row scatter builds
            the source-position vector -> payload gathers at the fixed
            width pull_pad.  The host then needs ONE blocking read per
            tick (nh + lost scalars ride along); the former flow paid
            two extra round trips (count readback, index upload) that
            serialized the pipeline through the relay each tick.
            """
            cnt = count.reshape(-1).astype(jnp.int32)    # (kw*n,)
            c2 = jnp.minimum(cnt, n_slots)
            lost = jnp.sum(cnt - c2)
            c3 = c2.reshape(kw, 1, n)
            sio = jax.lax.broadcasted_iota(jnp.int32, (kw, n_slots, n), 1)
            occ = (sio < c3).reshape(-1)                 # (C_CELLS,)
            occ_i = occ.astype(jnp.int32)
            idx = jnp.cumsum(occ_i) - 1                  # target position
            nh = jnp.sum(occ_i)
            tgt = jnp.where(occ & (idx < pull_pad), idx, pull_pad)
            cells = jnp.arange(C_CELLS, dtype=jnp.int32)
            pos = jnp.zeros((pull_pad + 1,), jnp.int32).at[tgt].set(
                cells
            )[:pull_pad]
            if kw > 1:
                dpx = dpx.reshape(kw, n_slots, XR, n)
                dpd = dpd.reshape(kw, n_slots, 8, n)
                xg = jnp.moveaxis(dpx, 2, 0).reshape(XR, C_CELLS)
                dg = jnp.moveaxis(dpd, 2, 0).reshape(8, C_CELLS)
                sf = dp_step.reshape(C_CELLS)
            else:
                xg = dpx.reshape(n_slots, XR, n).swapaxes(0, 1).reshape(
                    XR, C_CELLS
                )
                dg = dpd.reshape(n_slots, 8, n).swapaxes(0, 1).reshape(
                    8, C_CELLS
                )
                sf = dp_step.reshape(C_CELLS)
            xg = jnp.take(xg, pos, axis=1)
            dg = jnp.take(dg, pos, axis=1)
            sg = jnp.take(sf, pos)
            xp = xg[0::2] | (xg[1::2] << 16)   # (5, P)
            dp2 = dg[0::2] | (dg[1::2] << 16)  # (4, P)
            return nh, lost, xp, dp2, sg.astype(jnp.uint16), pos

        # Executable reuse across solve() calls: re-defining the jitted
        # closures every call discards XLA's dispatch cache, so a
        # multi-key batch (STATS, in28_8-style configs) recompiled the
        # tick/gather/compact programs PER KEY.  When the geometry is
        # unchanged, rebind the previous call's function objects (and
        # the arrays they close over) instead.
        geom_key = (
            self.range_power, bool(opts.symmetry), n, opts.nb_run, kw,
            n_slots, backend, nd, dp_size, bool(opts.compact),
            bool(slots_capped), pull_pad,
        )
        _cached = getattr(self, "_exec_cache", None)
        cache_hit = _cached is not None and _cached[0] == geom_key
        if cache_hit:
            (jx, jy, jd, dp_masks, tick_fn, gather_fn, pack_counts,
             compact_fn) = _cached[1]
        else:
            self._exec_cache = (
                geom_key,
                (jx, jy, jd, dp_masks, tick_fn, gather_fn, pack_counts,
                 compact_fn),
            )

        def read_compact(pend_out, cm):
            """Read one tick's compacted DPs (single blocking read)."""
            got = self._host_read(
                lambda: tuple(np.asarray(a) for a in cm)
            )
            nh, lost, xp, dp2, sg, pos = got
            nh = int(nh)
            lost = int(lost)
            if nh == 0:
                if lost:
                    return lost, None
                return None
            if nh > pull_pad:
                # overflow beyond the sized gather width (~150 sigma at
                # production rates, or a mis-sized -pullpad): fall back
                # to the exact counts-and-indices path for this tick
                flight = enqueue_pull(pend_out)
                return read_pull(flight) if flight is not None else None
            m = nh
            x = np.empty((10, m), dtype=np.uint32)
            xpm = xp[:, :m]
            x[0::2] = xpm & np.uint32(0xFFFF)
            x[1::2] = xpm >> np.uint32(16)
            dd = np.empty((8, m), dtype=np.uint32)
            dpm = dp2[:, :m]
            dd[0::2] = dpm & np.uint32(0xFFFF)
            dd[1::2] = dpm >> np.uint32(16)
            posm = pos[:m].astype(np.int64)
            wins = posm // (n_slots * n)
            lanes = posm % n
            return lost, lanes, wins, x, dd, sg[:m].astype(np.uint32)

        def enqueue_pull(pend):
            """Fallback stage 2: read a tick's DP counts, enqueue
            per-DP gathers.

            Blocks only on the (nibble-packed) count transfer; the
            gathers go out as ONE dispatch and stay in flight so they
            overlap the next tick on the device queue.
            """
            count, dpx, dpd, dp_step = pend
            pk = self._host_read(lambda: np.asarray(pack_counts(count)))
            if slots_capped:
                count_np = pk
            else:
                count_np = np.empty(pk.size * 2, dtype=np.uint8)
                count_np[0::2] = pk & np.uint8(15)
                count_np[1::2] = pk >> np.uint8(4)
            cnt = np.minimum(count_np, n_slots).astype(np.int64)
            lost = int(
                np.maximum(
                    count_np.astype(np.int64) - n_slots, 0
                ).sum()
            )
            wl = np.nonzero(cnt)[0]          # hit window-lanes
            if not wl.size:
                return (lost, None) if lost else None
            reps = cnt[wl]
            flat_wl = np.repeat(wl, reps)    # one entry per DP
            ends = np.cumsum(reps)
            slot_i = (np.arange(len(flat_wl)) - np.repeat(
                ends - reps, reps)).astype(np.int64)
            lanes = flat_wl % n
            wins = flat_wl // n
            flat = (wins * n_slots + slot_i) * n + lanes
            m = len(flat)
            chunks = []
            for off in range(0, m, pull_pad):
                part = flat[off:off + pull_pad]
                # int32 halves the index upload; flat < kw*slots*n
                # <= 2^29 at any supported geometry
                idx = np.zeros(pull_pad, dtype=np.int32)
                idx[:len(part)] = part
                chunks.append(
                    (len(part),)
                    + gather_fn(dpx, dpd, dp_step, jnp.asarray(idx))
                )
            return lost, lanes, wins, chunks

        def read_pull(flight):
            """Fallback stage 3 transfer: bring the gathered DP columns
            to host.

            The device packed 16-bit limb rows pairwise into u32 lanes
            (and steps into u16); unpack vectorized here.
            """
            if len(flight) == 2:
                return flight      # lost-only (no hit lanes)
            lost, lanes, wins, chunks = flight
            xs, ds, ss = [], [], []
            for m, dpx_g, dpd_g, step_g in chunks:
                got = self._host_read(
                    lambda a=dpx_g, b=dpd_g, c=step_g: (
                        np.asarray(a), np.asarray(b), np.asarray(c)
                    )
                )
                xp, dp2, sg = got
                x = np.empty((10, xp.shape[1]), dtype=np.uint32)
                x[0::2] = xp & np.uint32(0xFFFF)
                x[1::2] = xp >> np.uint32(16)
                dd = np.empty((8, dp2.shape[1]), dtype=np.uint32)
                dd[0::2] = dp2 & np.uint32(0xFFFF)
                dd[1::2] = dp2 >> np.uint32(16)
                xs.append(x[:, :m])
                ds.append(dd[:, :m])
                ss.append(sg[:m].astype(np.uint32))
            return (
                lost, lanes, wins,
                np.concatenate(xs, axis=1),
                np.concatenate(ds, axis=1),
                np.concatenate(ss),
            )

        def apply_resets(resets):
            """Dead lanes draw fresh kangaroos (Kangaroo.cpp:467-471)."""
            nonlocal px, py, d, symclass
            if not resets:
                return
            px, py, d = self._reset_lanes(px, py, d, resets, rng)
            if opts.symmetry:
                # same bucket padding as _reset_lanes (fixed scatter
                # shapes; duplicate writes of 0 are idempotent)
                lanes = [l for l, _ in resets]
                bucket = 8
                while bucket < len(lanes):
                    bucket *= 2
                lanes += [lanes[-1]] * (bucket - len(lanes))
                lanes_a = jnp.asarray(np.array(lanes, dtype=np.int32))
                symclass = symclass.at[lanes_a].set(jnp.uint32(0))

        _wd2 = self.width_div2
        _wlo = np.uint64(_wd2 & 0xFFFFFFFFFFFFFFFF)
        _whi = np.uint64(_wd2 >> 64)

        def encode_records(lanes, wins, x_np, d_np, step_np):
            """Walk-ordered (m, 36) table records, fully vectorized.

            Device distances become the reference's sign/type-flagged
            126-bit D encoding with numpy u64 pairs (identical to
            true_distance+convert on each item: positive -> mag,
            negative -> n-|v| which flags the sign bit; parity pinned
            by tests/test_resume.py native-vs-dict drain tests).
            Returns (records, lanes_in_walk_order).
            """
            # global step across the kw fused windows of this tick
            steps = step_np.astype(np.int64) + wins * opts.nb_run
            order = np.lexsort((lanes, steps))  # walk order (step, lane)
            lanes = lanes[order]
            m = len(lanes)
            xl = x_np[:, order].T                # (m, 10) 16-bit limbs
            dl = d_np[:, order].T.astype(np.uint64)  # (m, 8)
            hbk = (xl[:, 8] | ((xl[:, 9] & 0x3) << 16)).astype(np.uint32)
            lo = dl[:, 0] | (dl[:, 1] << np.uint64(16)) | (
                dl[:, 2] << np.uint64(32)) | (dl[:, 3] << np.uint64(48))
            hi = dl[:, 4] | (dl[:, 5] << np.uint64(16)) | (
                dl[:, 6] << np.uint64(32)) | (dl[:, 7] << np.uint64(48))
            ktype = (lanes & 1).astype(np.uint64)
            if opts.symmetry:
                neg = (hi >> np.uint64(63)).astype(bool)
                vlo, vhi = lo, hi
            else:
                wild = ktype == 1
                borrow = (lo < _wlo).astype(np.uint64)
                nl = lo - _wlo
                nh = hi - _whi - borrow
                below = (hi < _whi) | ((hi == _whi) & (lo < _wlo))
                vlo = np.where(wild, nl, lo)
                vhi = np.where(wild, nh, hi)
                neg = wild & below
            # |v| for negative values (two's-complement negate, 128b)
            mlo = (~vlo) + np.uint64(1)
            mhi = (~vhi) + (vlo == 0).astype(np.uint64)
            vlo = np.where(neg, mlo, vlo)
            vhi = np.where(neg, mhi, vhi)
            if (vhi >> np.uint64(62)).any():
                raise ValueError("distance magnitude exceeds 126 bits")
            dhi = vhi | (ktype << np.uint64(62)) | (
                neg.astype(np.uint64) << np.uint64(63))
            rec = np.empty((m, 36), dtype=np.uint8)
            rec[:, 0:4] = hbk.astype("<u4").view(np.uint8).reshape(m, 4)
            rec[:, 4:20] = (
                xl[:, :8].astype("<u2").view(np.uint8).reshape(m, 16)
            )
            rec[:, 20:28] = vlo.astype("<u8").view(np.uint8).reshape(m, 8)
            rec[:, 28:36] = dhi.astype("<u8").view(np.uint8).reshape(m, 8)
            return rec, lanes

        def drain_native(lanes, wins, x_np, d_np, step_np):
            """Batch drain into the native C++ table: ONE ctypes call
            per chunk inserts the whole vectorized-encoded batch
            (~0.3 us/DP vs ~4.4 us on the per-item path)."""
            nonlocal result
            rec, lanes = encode_records(lanes, wins, x_np, d_np, step_np)
            m = rec.shape[0]
            resets = []
            chunk = 32768  # keeps dup/collision report buffers ample
            for off in range(0, m, chunk):
                part = min(chunk, m - off)
                _, dup_idx, dup_total, colls = (
                    self.hash_table.add_batch_raw(
                        rec[off:off + part].tobytes(), part
                    )
                )
                self.stats.dead += dup_total
                for i in dup_idx:
                    lane = int(lanes[off + i])
                    resets.append((lane, lane % 2))
                for x128, d_new, d_old, idx in colls:
                    d1, t1 = calc_dist_and_type(d_old)
                    d2, t2 = calc_dist_and_type(d_new)
                    dead, res = collision_check(
                        d1, t1, d2, t2,
                        self.key_to_search, self.key_to_search_neg,
                        self.range_start,
                        width_div2_sym=(
                            self.width_div2 if opts.symmetry else None
                        ),
                    )
                    if res is not None:
                        result = res
                        return True
                    if dead:
                        self.stats.dead += 1
                        lane = int(lanes[off + idx])
                        resets.append((lane, lane % 2))
            apply_resets(resets)
            return False

        def drain(pulled):
            """Process pulled DP hits; returns True to stop.

            Pure host work: runs while the next tick executes on
            device.  Dead-kangaroo resets land one tick late (the lane
            walks one extra launch window), the same slack class as the
            reference's asynchronous GPU readback loop
            (GPUEngine.cu:607-677).
            """
            nonlocal px, py, d, symclass, result, sink_end
            if pulled is None:
                return False
            if len(pulled) == 2:          # lost-only tick, no hits
                lost, _ = pulled
                lanes = None
            else:
                lost, lanes, wins, x_np, d_np, step_np = pulled
            # DP hits beyond the on-chip capture slots are dropped by
            # the kernel; count and warn like the reference's output
            # ring overflow (GPUEngine.cu:641-648)
            if lost:
                self.stats.lost += lost
                if not self._lost_warned and not opts.quiet:
                    self._lost_warned = True
                    print(
                        f"\nWarning, {lost} items lost\n"
                        f"Hint: increase dp bit number or decrease "
                        f"-nbrun to lower the DP rate per launch window"
                    )
            if lanes is None:
                return False
            if dp_sink is not None:
                # Client mode: ship DPs to the server instead of the
                # local table (reference: SolveKeyCPU client branch,
                # Kangaroo.cpp:435-456).  The wire records are built
                # with the same vectorized encoder as the native drain
                # (kIdx column = origin lane), no per-record Python.
                # The sink returns True when the server reports
                # end-of-search.
                rec, lanes_o = encode_records(
                    lanes, wins, x_np, d_np, step_np
                )
                m = rec.shape[0]
                wire = np.empty((m, 40), dtype=np.uint8)
                wire[:, 0:4] = (
                    lanes_o.astype("<u4").view(np.uint8).reshape(m, 4)
                )
                wire[:, 4:40] = rec
                if dp_sink(wire.tobytes(), m):
                    sink_end = True
                    return True
                return False
            if isinstance(self.hash_table, NativeHashTable):
                return drain_native(lanes, wins, x_np, d_np, step_np)
            # vectorized limb -> int conversion, one column per DP
            xs_i = limbs_to_ints_fast(x_np)
            ds_i = limbs_to_ints_fast(d_np)
            # process in walk order (step, then lane) so the table
            # fills like a sequential replay
            steps = step_np.astype(np.int64) + wins * opts.nb_run
            order = np.lexsort((lanes, steps))
            resets = []
            for pos in order:
                x = int(xs_i[pos])
                ddev = int(ds_i[pos])
                lane = int(lanes[pos])
                ktype = lane % 2
                d_modn = herd_mod.true_distance(
                    ddev, ktype, self.width_div2, symmetry=opts.symmetry
                )
                status = self.hash_table.add_dp(x, d_modn, ktype)
                if status == ADD_COLLISION:
                    dead, res = collision_check(
                        self.hash_table.k_dist,
                        self.hash_table.k_type,
                        d_modn,
                        ktype,
                        self.key_to_search,
                        self.key_to_search_neg,
                        self.range_start,
                        width_div2_sym=(
                            self.width_div2 if opts.symmetry else None
                        ),
                    )
                    if res is not None:
                        result = res
                        return True
                    if dead:
                        self.stats.dead += 1
                        resets.append((lane, ktype))
                elif status == ADD_DUPLICATE:
                    self.stats.dead += 1
                    resets.append((lane, ktype))
            apply_resets(resets)
            return False

        # ---- startup pipeline (round 5) -------------------------------
        # The pre-walk phase used to run strictly serially: jump-kernel
        # compile, THEN herd creation, THEN gather/reset compiles --
        # 277 s warm on the 72-bit solve.  The compiles are independent
        # of the herd data, so warm the tick/compact executables on a
        # background thread (dummy zero-state dispatch at the real
        # shapes populates the jit dispatch cache) while the main
        # thread creates and uploads the herd and pre-compiles the
        # reset path.  KT_PHASE=1 prints the phase breakdown.
        _phase_t = [time.time()]
        _phases = {}

        def _ph(name):
            now = time.time()
            _phases[name] = now - _phase_t[0]
            _phase_t[0] = now

        warm_thread = None
        if backend == "pallas" and nd == 1 and not cache_hit:
            def _prewarm_exec():
                try:
                    zpx = jnp.zeros((16, n), jnp.uint32)
                    zpy = jnp.zeros((16, n), jnp.uint32)
                    zd = jnp.zeros((8, n), jnp.uint32)
                    zsc = jnp.zeros((n,), jnp.uint32)
                    o = tick_fn(zpx, zpy, zd, zsc)
                    if opts.compact:
                        cm = compact_fn(o[3], o[4], o[5], o[6])
                        int(np.asarray(cm[0]))  # force compile + run
                    else:
                        np.asarray(pack_counts(o[3]))
                        zidx = jnp.zeros((pull_pad,), jnp.int32)
                        g = gather_fn(o[4], o[5], o[6], zidx)
                        np.asarray(g[2][:1])
                except Exception:
                    pass  # prewarm is best-effort; the loop compiles lazily

            if __import__("os").environ.get("KT_PAR_PREWARM") == "1":
                # overlapped prewarm: measured to WEDGE through the
                # axon relay (two threads of one process issuing remote
                # compiles concurrently hang forever at the RPC layer;
                # reproduced twice on the 72-bit solve) -- opt-in for
                # co-located deployments whose compile path is local
                warm_thread = threading.Thread(
                    target=_prewarm_exec, daemon=True
                )
                warm_thread.start()
            else:
                _prewarm_exec()
                _ph("tick_prewarm")

        # Continuation semantics: a repeated solve() on the SAME key
        # keeps the accumulated table/count and continues the walk from
        # last_state; a new key resets both (reference: hashTable.Reset
        # between keys, Kangaroo.cpp:1054-1056).  A -i resume keeps the
        # table loaded by the CLI (self.resumed).
        same_key = getattr(self, "_active_key_idx", None) == key_idx
        if not self.resumed and not same_key:
            self.hash_table.reset()
            self.offset_count = 0
            self.stats.dead = 0
        self.resumed = False
        self._active_key_idx = key_idx
        if (
            same_key
            and self.loaded_kangaroos is None
            and getattr(self, "last_state", None) is not None
        ):
            self.loaded_kangaroos = tuple(
                np.asarray(a) for a in self.last_state
            )

        if self.loaded_kangaroos is not None:
            # Reconcile the restored herd with the requested lane count
            # (reference: FectchKangaroos fills any shortfall with fresh
            # kangaroos and warns about surplus, Backup.cpp:283-287).
            # The lane-parity type convention (lane % 2) is preserved by
            # truncating/appending at the tail.
            px_np, py_np, d_np = (np.asarray(a) for a in self.loaded_kangaroos)
            nl = px_np.shape[1]
            if nl > opts.nb_kangaroo:
                if not opts.quiet:
                    print(
                        f"Warning: {nl - opts.nb_kangaroo} unhandled "
                        f"kangaroos! (-nk {opts.nb_kangaroo} < {nl} restored)"
                    )
                px_np = px_np[:, :opts.nb_kangaroo]
                py_np = py_np[:, :opts.nb_kangaroo]
                d_np = d_np[:, :opts.nb_kangaroo]
            elif nl < opts.nb_kangaroo:
                fx, fy, fd = herd_mod.create_herd(
                    opts.nb_kangaroo - nl,
                    self.range_power,
                    self.width_div2,
                    self.key_to_search,
                    nl % 2,
                    rng,
                    symmetry=opts.symmetry,
                )
                px_np = np.concatenate([px_np, fx], axis=1)
                py_np = np.concatenate([py_np, fy], axis=1)
                d_np = np.concatenate([d_np, fd], axis=1)
            px, py, d = jnp.asarray(px_np), jnp.asarray(py_np), jnp.asarray(d_np)
        else:
            # device=True: px/py never leave the device (skips a 64 MB
            # download + 84 MB re-upload per 2^19-lane herd -- half the
            # relay-bound solve startup)
            px, py, d = herd_mod.create_herd(
                opts.nb_kangaroo,
                self.range_power,
                self.width_div2,
                self.key_to_search,
                TAME,
                rng,
                symmetry=opts.symmetry,
                device=True,
            )
        symclass = jnp.zeros((opts.nb_kangaroo,), dtype=jnp.uint32)
        if nd > 1:
            from ..parallel import sharding as sharding_mod
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            px, py, d = sharding_mod.shard_herd(mesh, px, py, d)
            symclass = jax.device_put(
                symclass,
                NamedSharding(mesh, Pspec(sharding_mod.HERD_AXIS)),
            )
        # the restored herd is absorbed into px/py/d; keep it from
        # being re-applied (stale) by a later solve() call
        self.loaded_kangaroos = None
        _ph("herd_dispatch")

        self.stats.count = self.offset_count
        t0 = time.time()
        last_status = t0
        last_save = t0

        # Pre-compile the dead-lane reset path at its smallest bucket
        # (8): the first real reset otherwise stalls the measured walk
        # for the full remote compile (~2 min observed on the 72-bit
        # hardware solve).  Identity writes: lanes 0..7 get their own
        # current values back, and the throwaway RNG leaves the herd
        # RNG stream untouched.
        if backend == "pallas" and nd == 1 and opts.nb_kangaroo >= 8:
            warm_rng = rng_mod.MT19937(0)
            dists = [
                herd_mod.draw_start_distances(
                    1, self.range_power, self.width_div2, t % 2,
                    warm_rng, symmetry=opts.symmetry,
                )[0]
                for t in range(8)
            ]
            herd_mod.herd_from_distances(
                dists, np.arange(8, dtype=np.uint32) & 1,
                self.width_div2, self.key_to_search,
                symmetry=opts.symmetry,
            )
            lanes_w = jnp.asarray(np.arange(8, dtype=np.int32))
            px = px.at[:, lanes_w].set(px[:, :8])
            py = py.at[:, lanes_w].set(py[:, :8])
            d = d.at[:, lanes_w].set(d[:, :8])
            if opts.symmetry:
                symclass = symclass.at[lanes_w].set(symclass[:8])
        _ph("reset_prewarm")
        if warm_thread is not None:
            warm_thread.join()
        _ph("tick_prewarm_join")
        if __import__("os").environ.get("KT_PHASE") and not opts.quiet:
            print("[startup] " + " ".join(
                f"{k}={v:.1f}s" for k, v in _phases.items()
            ))

        # Pipelined loop (the device queue never drains).  With
        # device-side compaction (default): 2 stages -- iter T
        # dispatches tick T plus its compaction, then makes ONE
        # blocking read of tick T-1's compacted DPs and host-processes
        # them while tick T runs.  Fallback (-compact off / overflow):
        # the former 3-stage flow (dispatch T; read T-1 counts +
        # enqueue gathers; transfer + process T-2).  The reference GPU
        # loop overlaps the same way with its async readback
        # (GPUEngine.cu:607-677); dead-kangaroo resets land a few
        # launch windows late, the same slack class.
        use_compact = opts.compact
        pending = None   # tick outputs awaiting count read / compact read
        inflight = None  # enqueued fallback gathers awaiting transfer
        stop = False
        try:
            while result is None and not stop:
                if max_ticks is not None and tick >= max_ticks:
                    break
                if (
                    opts.max_step > 0
                    and self.stats.count
                    > opts.max_step * self.stats.expected_ops
                ):
                    break
                out = tick_fn(px, py, d, symclass)
                px, py, d = out[0], out[1], out[2]
                if opts.symmetry:
                    symclass = out[7]
                self.stats.count += n * opts.nb_run * kw
                tick += 1

                if use_compact:
                    cm = compact_fn(out[3], out[4], out[5], out[6])
                    if pending is not None:
                        stop = drain(read_compact(*pending))
                    pending = (out[3:7], cm)
                else:
                    gath = (
                        enqueue_pull(pending)
                        if pending is not None else None
                    )
                    if inflight is not None:
                        stop = drain(read_pull(inflight))
                    inflight = gath
                    pending = out[3:7]

                now = time.time()
                if progress is not None and now - last_status > 2.0:
                    progress(self, now - t0)
                    last_status = now
                if (
                    (opts.work_file or save_hook is not None)
                    and now - last_save > opts.save_period
                    and result is None
                ):
                    if save_hook is not None:
                        # client mode: kangaroo-only backup (local HEADK or
                        # via the server, reference -w / -wss client paths)
                        hx, hy, hd = self._host_read(
                            lambda: (np.asarray(px), np.asarray(py),
                                     np.asarray(d))
                        )
                        save_hook(self, hx, hy, hd, now - t0)
                    else:
                        self._save_work(px, py, d, now - t0)
                    last_save = now

            # flush the pipeline stages
            if use_compact:
                if result is None and not sink_end and pending is not None:
                    drain(read_compact(*pending))
            else:
                if result is None and not sink_end and inflight is not None:
                    drain(read_pull(inflight))
                if result is None and not sink_end and pending is not None:
                    gath = enqueue_pull(pending)
                    if gath is not None:
                        drain(read_pull(gath))

        except DeviceHangError as e:
            # hung accelerator/relay: checkpoint what the host
            # has (table + count; the herd arrays may be
            # unreadable) and abort instead of hanging forever
            if not opts.quiet:
                print(f"\nDevice watchdog: {e}")
            if opts.work_file:
                from ..io import backup as backup_mod
                name = opts.work_file
                if opts.split_work_file:
                    name = backup_mod.split_file_name(name)
                backup_mod.save_work(
                    name, self, None, None, None,
                    self.stats.count,
                    self.offset_time + time.time() - t0,
                    save_kangaroo=False,
                )
                if not opts.quiet:
                    print(f"Saved work to {name} (table only); "
                          f"resume with -i (DP-overhead cost only)")

        self.stats.time = self.offset_time + time.time() - t0
        self.last_state = (px, py, d)
        # a repeated solve() on this key continues from here
        self.offset_count = self.stats.count
        self.finish_save()
        if result is not None and opts.out_file:
            self._output(result)
        return result

    def _host_read(self, fn):
        """Run a blocking device->host read under the watchdog.

        A hung accelerator (or remote-device relay) blocks np.asarray
        forever; running the read on a worker thread bounds the wait.
        On timeout the worker stays blocked (daemon, dies with the
        process) and DeviceHangError aborts the solve, which
        checkpoints the table first (see solve()).
        """
        to = getattr(self.opts, "device_timeout", 0.0)
        if not to:
            return fn()
        import queue
        import threading

        # a DAEMON thread, not an executor: a truly hung read must not
        # block interpreter exit (executor workers are joined atexit)
        q: "queue.Queue" = queue.Queue(maxsize=1)

        def run():
            try:
                q.put((True, fn()))
            except BaseException as e:  # surface device errors too
                q.put((False, e))

        threading.Thread(
            target=run, daemon=True, name="kangaroo-devread"
        ).start()
        try:
            ok, val = q.get(timeout=to)
        except queue.Empty:
            raise DeviceHangError(
                f"device read exceeded {to:.0f}s watchdog"
            ) from None
        if not ok:
            raise val
        return val

    def _reset_lanes(self, px, py, d, resets, rng):
        """Dead kangaroos: draw fresh ones (reference: Kangaroo.cpp:467-471).

        Distances are drawn per reset in order (RNG-stream-identical to
        the reference's per-lane CreateHerd(1) calls), but the position
        rebuild and the state update are batched: ONE scalar-mult
        dispatch and ONE scatter per array instead of a full-array
        update per dead kangaroo (which serialized against the
        pipelined ticks at high dead rates).

        Shapes are padded to a small set of bucket sizes: the scalar
        mult and the scatter are jitted per shape, and reset batches of
        1, 2, 3... lanes each cost a fresh multi-minute compile through
        the remote compile service otherwise (measured on the 56-bit
        solve: the wall rate halved whenever a new dead-count appeared).
        Pad columns repeat the last real lane/values, so the duplicate
        scatter writes are idempotent.
        """
        sym = self.opts.symmetry
        dists, types, lanes = [], [], []
        for lane, ktype in resets:
            dists.append(herd_mod.draw_start_distances(
                1, self.range_power, self.width_div2, ktype, rng,
                symmetry=sym,
            )[0])
            types.append(ktype)
            lanes.append(lane)
        m = len(lanes)
        bucket = 8
        while bucket < m:
            bucket *= 2
        pad = bucket - m
        dists += [dists[-1]] * pad
        types += [types[-1]] * pad
        lanes += [lanes[-1]] * pad
        npx, npy, nd = herd_mod.herd_from_distances(
            dists, np.array(types, dtype=np.uint32), self.width_div2,
            self.key_to_search, symmetry=sym,
        )
        lanes_a = jnp.asarray(np.array(lanes, dtype=np.int32))
        px = px.at[:, lanes_a].set(jnp.asarray(npx))
        py = py.at[:, lanes_a].set(jnp.asarray(npy))
        d = d.at[:, lanes_a].set(jnp.asarray(nd))
        return px, py, d

    def _output(self, res):
        """Append the solved key (reference: Output, Kangaroo.cpp:176-213)."""
        pub = curve.get_public_key_hex(self.cfg.keys[self.key_idx], True)
        with open(self.opts.out_file, "a") as f:
            f.write(
                f"Key#{self.key_idx:2d} [{res.variant}{res.sign_info}]Pub:  0x{pub} \n"
            )
            f.write(f"       Priv: 0x{res.private_key:X} \n")

    def _save_work(self, px, py, d, elapsed):
        """Checkpoint without stalling the walk.

        The write runs on a background thread against a fuzzy snapshot
        (see backup.write_hash_table); the solver thread pays the
        device->host copy of the herd plus, with the native table, at
        most one bucket-span serialization per drain (write_region
        releases the table lock between spans).  The reference instead
        pauses all workers for the whole write behind
        saveRequest/saveMutex (Backup.cpp:449-472); -wt keeps its
        meaning as the bound on waiting for a save that is still
        running.
        """
        import threading

        from ..io import backup

        prev = getattr(self, "_save_thread", None)
        if prev is not None and prev.is_alive():
            prev.join(timeout=self.opts.save_timeout)
            if prev.is_alive():
                if not self.opts.quiet:
                    print("\nSaveWork timeout !")
                return
        px_np, py_np, d_np = self._host_read(
            lambda: (np.asarray(px), np.asarray(py), np.asarray(d))
        )
        count = self.stats.count
        total_time = self.offset_time + elapsed
        table = self.hash_table
        name = self.opts.work_file
        if self.opts.split_work_file:
            # -wsplit: swap in a fresh table NOW (solver thread) and
            # write the frozen one -- a consistent snapshot; offline
            # merge recovers cross-file collisions (README.md:152-196).
            # Files are timestamped like the reference (Timer::getTS).
            self.hash_table = make_hash_table()
            name = backup.split_file_name(name)

        def write():
            backup.save_work(
                name,
                self,
                px_np, py_np, d_np,
                count,
                total_time,
                save_kangaroo=self.opts.save_kangaroo,
                table=table,
            )

        t = threading.Thread(target=write, daemon=True)
        t.start()
        self._save_thread = t

    def finish_save(self):
        """Join an in-flight background save (end of solve / tests)."""
        t = getattr(self, "_save_thread", None)
        if t is not None and t.is_alive():
            t.join()
