"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference has none (prints only).  Here: named trace annotations around
the hot phases (propagate / exchange / update) via ``jax.profiler``, and a
context manager that dumps a perfetto-compatible trace directory, driven by
``--profile`` on the train CLI and ``--profile`` on bench.py."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


def annotate(name: str):
    """Named trace annotation usable as decorator or context manager."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(out_dir: Optional[str]) -> Iterator[None]:
    """Capture a profiler trace into ``out_dir`` (no-op when None).

    View with perfetto / tensorboard (the trace dir contains .trace.json.gz
    under plugins/profile/...)."""
    if not out_dir:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
