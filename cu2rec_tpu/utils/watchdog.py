"""Stall watchdog: make silent remote-compile hangs visible.

On a healthy backend, compiles either succeed or raise — and the ALS
dispatch ladder (ops/als.py fused_dispatch) degrades tiers on the
*raise*.  A degraded tunneled compile service has a third behavior this
round measured repeatedly: the compile RPC never answers, the calling
thread blocks inside the runtime with zero CPU, and nothing in Python
ever gets control again — a training journey silently freezes at the
"Hyperparameters:" banner for 20+ minutes with no way to tell a slow
compile from a dead one.

A watchdog cannot *unblock* a hung C call, but it can tell the operator
what is happening: wrap any potentially-compiling region and a daemon
timer prints an escalating heartbeat once the region exceeds its
expected duration, including what to try (the same escapes this repo
ships: compile cache warm-up, `CU2REC_ALS_BUDGET`, the CPU backend).

    from cu2rec_tpu.utils.watchdog import stall_watchdog

    with stall_watchdog("ALS half-sweep compile", after_s=120):
        out = fused_fn(T, regs, heavies)   # may hang in remote compile

Cost when the region completes before ``after_s``: one short-lived
daemon thread parked in ``Event.wait`` (spawned per wrapped region,
released the moment the region exits).  ``CU2REC_WATCHDOG=0`` (any
non-positive number, or off/false/no) disables globally;
``CU2REC_WATCHDOG=<seconds>`` overrides the default threshold.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading
import time

_HINT = ("still waiting — a healthy compile of this size finishes in "
         "minutes; if this repeats, the remote compile helper is likely "
         "degraded (see docs/R5_CHANGES.md environment note).  Escapes: "
         "rerun to hit the compile cache, shrink programs "
         "(CU2REC_ALS_BUDGET for ALS/iALS), or use the CPU backend for "
         "quality-only runs.")


def _threshold(after_s: float | None) -> float | None:
    """Resolve the warning threshold; None disables the watchdog."""
    env = os.environ.get("CU2REC_WATCHDOG")
    if env is not None:
        if env.strip().lower() in ("off", "false", "no", ""):
            return None
        try:
            v = float(env)
        except ValueError:
            return after_s
        # Any non-positive number means "off" (0, 0.0, -1, ...) — a 0.0
        # threshold would otherwise fire a heartbeat on every region.
        return v if v > 0 else None
    return after_s


@contextlib.contextmanager
def stall_watchdog(what: str, after_s: float = 120.0,
                   every_s: float = 60.0, stream=None):
    """Print an escalating heartbeat while the wrapped block runs longer
    than ``after_s`` (then every ``every_s``).  Reentrant and
    exception-transparent; the timer thread is a daemon and is cancelled
    the moment the block exits."""
    threshold = _threshold(after_s)
    if threshold is None:
        yield
        return
    out = stream or sys.stderr
    t0 = time.monotonic()
    done = threading.Event()

    def beat():
        if done.wait(threshold):
            return
        while True:
            mins = (time.monotonic() - t0) / 60.0
            print(f"[cu2rec watchdog] {what}: blocked for {mins:.1f} min "
                  f"with no progress; {_HINT}", file=out, flush=True)
            if done.wait(every_s):
                return

    t = threading.Thread(target=beat, daemon=True,
                         name="cu2rec-stall-watchdog")
    t.start()
    try:
        yield
    finally:
        done.set()
