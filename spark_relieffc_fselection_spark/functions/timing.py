"""Env-gated stage timing shared by the long dataflows (fit_relief,
fit_mdlp_edges, the q14-q17 pipe). One implementation so the debug
surface (env var name, output stream, format) cannot drift between
call sites."""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Callable


def stage_timer(prefix: str) -> Callable[[str], None]:
    """Return a ``mark(label)`` closure printing ``#<prefix> <label>:
    <elapsed>s`` to stderr when ``SPARK_GRAFT_DEBUG_TIMING=1`` (and
    resetting the stage clock either way — marks stay cheap and
    side-effect-free when the flag is off)."""
    dbg = os.environ.get("SPARK_GRAFT_DEBUG_TIMING") == "1"
    t0 = time.time()

    def mark(label: str) -> None:
        nonlocal t0
        if dbg:
            print(f"#{prefix} {label}: {time.time() - t0:.2f}s", file=sys.stderr)
        t0 = time.time()

    return mark
