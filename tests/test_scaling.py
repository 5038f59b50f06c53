"""Weak-scaling harness mechanics on the virtual 8-device CPU mesh.

The production scaling claim (>=85 % on real chips) rests on (a) the
walk being embarrassingly parallel and (b) the host drain staying off
the critical path.  (a) is structural (no collectives in the tick);
this test pins (b) and that the harness itself runs on every mesh
size it will be used at.
"""

import sys


def test_weak_scaling_harness_and_drain_cost():
    sys.modules.pop("scripts.weak_scaling", None)
    from scripts.weak_scaling import run_sizes

    results, devices = run_sizes(
        sizes=(1, 8), lanes_per_dev=512, nb_run=4, reps=2
    )
    assert len(results) == 2
    one, eight = results
    assert eight["devices"] == 8
    # drain (host unpack of slot arrays) must be far below kernel time
    # on every mesh size -- the pipelined solver overlaps it entirely
    for r in results:
        assert r["drain_s_per_tick"] < 0.5 * r["kernel_s_per_tick"], r
    # sanity: total throughput must not DROP when adding devices
    assert eight["mks"] > 0.8 * one["mks"], (one, eight)
