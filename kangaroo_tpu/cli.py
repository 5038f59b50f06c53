"""Command-line entry point.

Flag surface mirrors the reference binary (main.cpp:33-359) with TPU
equivalents where the original is CUDA-specific:

  -t/-gpu/-gpuId/-g (thread/GPU selection) ->
  -nk (herd lanes), -nbrun (jumps per device tick), -backend xla|pallas,
  -devices (mesh size; default all).

Everything else keeps the reference's name and meaning.
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import List, Optional

from .constants import DEFAULT_PORT, RELEASE


def print_usage() -> None:
    print(
        """kangaroo-tpu [options] inFile
 -v: Print version
 -d dpBit: Specify number of leading zeros for the DP method (default is auto)
 -nk n: Number of kangaroos (herd lanes on device), default 2^18
 -nbrun n: Jumps per device tick (default: auto from DP size)
 -nwin k: Launch windows fused per device dispatch (default: auto;
       each dispatch costs a host round trip, fusing k windows
       divides that overhead by k)
 -dpcost s: Host+transfer cost per drained DP in seconds used by the
       auto-DP model (default ~8e-6 for relay-attached devices; pass
       ~1e-6 when the accelerator is co-located with the host)
 -backend xla|pallas: Jump kernel backend (default pallas on TPU)
 -platform name: Force the JAX platform (e.g. cpu, tpu) before device
       init; use "-platform cpu" to run on hosts whose accelerator is
       absent or unreachable
 -sym: Equivalence-class walk over {P,-P} (~sqrt(2) speedup; work files
       are NOT compatible with non-symmetric runs; in client/server
       mode EVERY participant must use -sym)
 -devices n: Number of mesh devices to use (default all)
 -w workfile: Specify file to save work into (current processed key only)
 -i workfile: Specify file to load work from (current processed key only)
 -wi workInterval: Periodic interval (in seconds) for saving work
 -ws: Save kangaroos in the work file
 -wss: Save kangaroos via the server
 -wsplit: Split work file of server and reset hashtable
 -wt timeout: Save work timeout in millisec (max wait for a running
       background save before skipping an interval; default 3000)
 -wm file1 file2 destfile: Merge work file
 -wmdir dir destfile: Merge directory of work files
 -winfo file1: Work file info file
 -wpartcreate name: Create empty partitioned work file (name is a directory)
 -wcheck workfile: Check workfile integrity
 -m maxStep: number of operations before give up the search (maxStep*expected operation)
 -s: Start in server mode
 -c server_ip: Start in client mode and connect to server server_ip
 -sp port: Server port, default is 17403
 -nt timeout: Network timeout in millisec (default is 3000ms)
 -o fileName: output result to fileName
 -l: List devices
 -check: Check kernel vs reference implementation
 inFile: input configuration file"""
    )
    sys.exit(0)


def _arg(argv: List[str], i: int, name: str) -> str:
    if i >= len(argv):
        print(f"Missing argument for {name}")
        sys.exit(-1)
    return argv[i]


def format_status(solver, elapsed: float, rate: float, dead: int) -> str:
    """Reference status line (Thread.cpp:306-321)."""
    count = solver.stats.count
    exp = solver.stats.expected_ops
    avg = f"{rate / 1e6:.2f} MK/s"
    cnt = f"2^{math.log2(count):.2f}" if count else "2^0"
    expected_t = ""
    if rate > 0 and exp > 0:
        left = (exp - count) / rate
        if left > 0:
            expected_t = f"[{left:.0f}s left]"
    return f"[{avg}][Count {cnt}][Dead {dead}][{elapsed:.0f}s]{expected_t}"


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (unless the user set one).

    The fused jump kernel at production block sizes takes minutes to
    compile through the TPU compile service; the cache makes that a
    first-run-only cost per (block, nb_run, dp-window) configuration.
    """
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    path = os.path.join(
        os.path.expanduser("~"), ".cache", "kangaroo_tpu", "xla_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup on it


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    enable_compile_cache()

    dp = -1
    symmetry = False
    nk = 1 << 18
    nb_run = 0  # auto
    nwin = 0    # auto
    dp_cost = -1.0  # auto (stack default; -dpcost overrides)
    backend = ""
    n_devices = 0
    work_file = ""
    load_file = ""
    save_period = 60
    save_timeout = 3.0
    save_kangaroo = False
    save_kangaroo_server = False
    wsplit = False
    max_step = 0.0
    server_mode = False
    server_ip = ""
    port = DEFAULT_PORT
    net_timeout = 3.0
    out_file = ""
    in_file = ""

    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-v":
            print(RELEASE)
            return 0
        elif a == "-d":
            i += 1; dp = int(_arg(argv, i, a))
        elif a == "-nk":
            i += 1; nk = int(_arg(argv, i, a))
        elif a == "-nbrun":
            i += 1; nb_run = int(_arg(argv, i, a))
        elif a == "-nwin":
            i += 1; nwin = int(_arg(argv, i, a))
        elif a == "-dpcost":
            i += 1; dp_cost = float(_arg(argv, i, a))
        elif a == "-backend":
            i += 1; backend = _arg(argv, i, a)
        elif a == "-platform":
            # must land before the first jax backend use; a plain env
            # var does not override an ambient sitecustomize pin
            i += 1
            plat = _arg(argv, i, a)
            import jax

            jax.config.update("jax_platforms", plat)
        elif a == "-sym":
            symmetry = True
        elif a == "-devices":
            i += 1; n_devices = int(_arg(argv, i, a))
        elif a == "-w":
            i += 1; work_file = _arg(argv, i, a)
        elif a == "-i":
            i += 1; load_file = _arg(argv, i, a)
        elif a == "-wi":
            i += 1; save_period = int(_arg(argv, i, a))
        elif a == "-ws":
            save_kangaroo = True
        elif a == "-wss":
            save_kangaroo_server = True
        elif a == "-wsplit":
            wsplit = True
        elif a == "-wt":
            # save-work timeout in ms (reference wtimeout): how long to
            # wait for a still-running background save before skipping
            i += 1; save_timeout = float(_arg(argv, i, a)) / 1000.0
        elif a == "-wm":
            f1 = _arg(argv, i + 1, a)
            f2 = _arg(argv, i + 2, a)
            dest = argv[i + 3] if i + 3 < len(argv) else ""
            from .io.merge import merge_work

            _, res, dead = merge_work(f1, f2, dest)
            if res is not None:
                print(f"Key# 0 solved during merge")
                print(f"       Priv: 0x{res.private_key:X}")
            return 0
        elif a == "-wmdir":
            d1 = _arg(argv, i + 1, a)
            dest = _arg(argv, i + 2, a)
            from .io.merge import merge_dir

            _, res, dead = merge_dir(d1, dest)
            if res is not None:
                print(f"Key# 0 solved during merge")
                print(f"       Priv: 0x{res.private_key:X}")
            return 0
        elif a == "-winfo":
            i += 1
            from .io.backup import work_info

            print(work_info(_arg(argv, i, a)))
            return 0
        elif a == "-wpartcreate":
            i += 1
            from .io.merge import create_empty_part_work

            create_empty_part_work(_arg(argv, i, a))
            return 0
        elif a == "-wcheck":
            i += 1
            from .core.check import check_work_file

            rep = check_work_file(_arg(argv, i, a))
            print(f"CheckWorkFile: {rep.n_items} DPs, {rep.n_wrong} wrong")
            return 0 if rep.ok else 1
        elif a == "-m":
            i += 1; max_step = float(_arg(argv, i, a))
        elif a == "-s":
            server_mode = True
        elif a == "-c":
            i += 1; server_ip = _arg(argv, i, a)
        elif a == "-sp":
            i += 1; port = int(_arg(argv, i, a))
        elif a == "-nt":
            i += 1; net_timeout = float(_arg(argv, i, a)) / 1000.0
        elif a == "-o":
            i += 1; out_file = _arg(argv, i, a)
        elif a == "-l":
            import jax

            for d in jax.devices():
                print(f"  {d.id}: {d.device_kind} ({d.platform})")
            return 0
        elif a == "-check":
            from .core.check import run_self_check

            return 0 if run_self_check() else 1
        elif a in ("-h", "--help"):
            print_usage()
        elif a.startswith("-"):
            print(f"Unknown option {a}")
            print_usage()
        else:
            in_file = a
        i += 1

    from .core.config import ProblemConfig, parse_config_file
    from .core.solver import KangarooSolver, SolverOptions

    if symmetry and (server_mode or server_ip):
        # The wire protocol has no symmetry marker (the reference's
        # USE_SYMMETRY is a compile-time property of every
        # participant); the operator must start the server AND all
        # clients with -sym or the distance conventions silently mix.
        print("-sym network mode: ALL participants must run with -sym "
              "(the wire has no symmetry marker)")

    if server_mode:
        if not in_file and not load_file:
            print_usage()
        from .net.server import DPServer

        lw = None
        if load_file:
            # resume the server from a saved work file (reference:
            # LoadWork before RunServer, main.cpp:338-352)
            from .io.backup import load_work

            lw = load_work(load_file, native=True)
            cfg = ProblemConfig(lw.range_start, lw.range_end, [lw.key])
            if dp < 0:
                dp = lw.dp_size
            if lw.symmetry != symmetry:
                print(
                    f"{load_file}: work file was saved "
                    f"{'with' if lw.symmetry else 'without'} -sym; "
                    f"adopting the file's convention"
                )
                symmetry = lw.symmetry
        else:
            cfg = parse_config_file(in_file)
        if dp < 0:
            print("Server mode requires -d (fixed DP size)")
            return -1
        server = DPServer(
            cfg, dp, port=port,
            work_file=work_file, save_period=save_period,
            split_work_file=wsplit, out_file=out_file,
            symmetry=symmetry,
        )
        if lw is not None:
            # load_work(native=True) already streamed the buckets into
            # a native table; adopt it (no per-record absorb loop)
            server.hash_table = lw.hash_table
            print(f"Loaded: {server.hash_table.n_items()} DPs")
        server.run()
        return 0

    opts = SolverOptions(
        nb_kangaroo=nk,
        dp_size=dp,
        nb_run=nb_run,
        windows_per_tick=nwin,
        dp_cost=dp_cost,
        max_step=max_step,
        backend=backend,
        out_file=out_file,
        work_file=work_file,
        save_period=save_period,
        save_timeout=save_timeout,
        save_kangaroo=save_kangaroo,
        split_work_file=wsplit,
        symmetry=symmetry,
        n_devices=n_devices,
    )

    if server_ip:
        from .net.client import run_client

        run_client(server_ip, port, opts, timeout=net_timeout,
                   save_kangaroo_server=save_kangaroo_server,
                   load_file=load_file)
        return 0

    if not in_file and not load_file:
        print_usage()

    if load_file:
        from .io.backup import load_work

        lw = load_work(load_file, native=True)
        if lw.symmetry != opts.symmetry:
            print(
                f"{load_file}: work file was saved "
                f"{'with' if lw.symmetry else 'without'} -sym; rerun "
                f"{'with' if lw.symmetry else 'without'} -sym to resume it"
            )
            return -1
        cfg = ProblemConfig(lw.range_start, lw.range_end, [lw.key])
        solver = KangarooSolver(cfg, opts)
        # load_work(native=True) already streamed the buckets into a
        # native table when available; adopt it directly
        solver.hash_table = lw.hash_table
        solver.offset_count = lw.count
        solver.offset_time = lw.time
        solver.resumed = True
        if lw.kangaroos is not None:
            solver.loaded_kangaroos = lw.kangaroos
        if opts.dp_size < 0:
            opts.dp_size = lw.dp_size
    else:
        cfg = parse_config_file(in_file)
        solver = KangarooSolver(cfg, opts)

    print(f"Kangaroo-TPU {RELEASE}")
    print(f"Start:{cfg.range_start:X}")
    print(f"Stop :{cfg.range_end:X}")
    print(f"Keys :{len(cfg.keys)}")

    # Startup estimates (reference: Kangaroo::Run, Kangaroo.cpp:976-999
    # and SetDP :154-172)
    print(f"Number of kangaroos: 2^{math.log2(nk):.2f}")
    suggested_dp = solver.suggest_dp(nk)
    if opts.dp_size < 0:
        print(f"Suggested DP: {suggested_dp}")
        opts.dp_size = solver.balanced_dp(nk, suggested=suggested_dp)
        if opts.dp_size != suggested_dp:
            # our DP drain costs ~us per point (host + device relay),
            # not ~100 ns like the reference's in-process insert, so
            # the auto choice also weighs the drain (see balanced_dp)
            print(f"Drain-balanced DP: {opts.dp_size}")
    exp_op, exp_ram, _ = solver.compute_expected(float(opts.dp_size), nk)
    print(f"Expected operations: 2^{math.log2(exp_op):.2f}")
    print(f"Expected RAM: {exp_ram:.1f}MB")
    dp_eff = min(opts.dp_size, 64)
    dmask = (~((1 << (64 - dp_eff)) - 1)) & 0xFFFFFFFFFFFFFFFF if dp_eff else 0
    print(f"DP size: {dp_eff} [0x{dmask:016x}]")

    last = {"count": 0, "t": time.time()}
    rates: List[float] = []

    def progress(s, elapsed):
        now = time.time()
        dtn = now - last["t"]
        rate = (s.stats.count - last["count"]) / dtn if dtn > 0 else 0.0
        last["count"] = s.stats.count
        last["t"] = now
        rates.append(rate)
        if len(rates) > 8:
            rates.pop(0)
        avg = sum(rates) / len(rates)
        print("\r" + format_status(s, elapsed, avg, s.stats.dead), end="")

    for key_idx in range(len(cfg.keys)):
        res = solver.solve(key_idx, progress=progress)
        if res is None:
            print("\nAborted")
            return 1
        pub = None
        from .core import curve

        pub = curve.get_public_key_hex(cfg.keys[key_idx], True)
        print(f"\nKey#{key_idx:2d} [{res.variant}{res.sign_info}]Pub:  0x{pub}")
        print(f"       Priv: 0x{res.private_key:X}")
        solver.hash_table.reset()
    return 0


if __name__ == "__main__":
    sys.exit(main())
