"""Observability: profiler scopes + event counters.

Replaces reference core/probes.{h,cpp}: the ~100 PBRT_* dtrace/counter
macros become (a) jax.profiler trace annotations around the render
phases — visible in xprof/tensorboard captures — and (b) a small host
counter registry the driver ticks per phase (rays traced, photons
stored, tiles rendered), printed at WorldEnd like ProbesPrint
(reference core/probes.cpp:163-199).
"""
from __future__ import annotations

import contextlib
import threading
from collections import defaultdict

_counters = defaultdict(int)
_lock = threading.Lock()


def count(name: str, n: int = 1):
    with _lock:
        _counters[name] += int(n)


def counters() -> dict:
    with _lock:
        return dict(_counters)


def reset():
    with _lock:
        _counters.clear()


def print_counters():
    """reference ProbesPrint (core/probes.cpp:163-199)."""
    import sys

    snap = counters()
    if not snap:
        return
    print("Statistics:", file=sys.stderr)
    for k in sorted(snap):
        print(f"    {k:<40s} {snap[k]:>14,d}", file=sys.stderr)


@contextlib.contextmanager
def scope(name: str):
    """Named profiler scope (shows up in jax.profiler / xprof traces)."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(logdir: str):
    import jax.profiler

    jax.profiler.start_trace(logdir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()
