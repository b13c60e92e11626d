"""Span-tree profiler: wall-time + device-memory per pipeline stage.

TPU-native equivalent of the reference CLI's ``SpanStats`` tracing layer and
``MeasuringAllocator`` (``tooling/cli/src/{span_stats.rs,measuring_alloc.rs}``):
nested named spans print a box-drawn tree with wall time and, where available,
JAX device memory stats.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

# When set, every span exit enqueues a trivial device op and blocks on it.
# TPU PJRT executes one in-order stream per device, so this drains all work
# dispatched inside the span — true per-stage device times instead of async
# dispatch times (at the cost of losing cross-stage overlap).
_SYNC = bool(os.environ.get("PROVEKIT_TPU_SYNC_SPANS"))


def _drain_device() -> None:
    try:
        import jax
        import jax.numpy as jnp
        (jnp.zeros((8,), jnp.uint32) + 1).block_until_ready()
    except Exception:
        pass


@dataclass
class Span:
    name: str
    start: float = 0.0
    elapsed: float = 0.0
    mem_delta: int = 0
    children: list = field(default_factory=list)


def _device_mem() -> int:
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) if stats else 0
    except Exception:
        return 0


class SpanTree:
    def __init__(self):
        self.root = Span("root")
        self.stack = [self.root]

    @contextmanager
    def span(self, name: str):
        s = Span(name, start=time.perf_counter())
        mem0 = _device_mem()
        self.stack[-1].children.append(s)
        self.stack.append(s)
        try:
            yield s
        finally:
            if _SYNC:
                _drain_device()
            s.elapsed = time.perf_counter() - s.start
            s.mem_delta = _device_mem() - mem0
            self.stack.pop()

    def report(self) -> str:
        lines = []

        def human(x: float) -> str:
            for unit, scale in (("s", 1), ("ms", 1e-3), ("us", 1e-6)):
                if x >= scale:
                    return f"{x / scale:7.2f} {unit}"
            return f"{x * 1e9:7.2f} ns"

        def hmem(b: int) -> str:
            sign = "+" if b >= 0 else "-"
            b = abs(b)
            for unit, scale in (("GiB", 1 << 30), ("MiB", 1 << 20),
                                ("KiB", 1 << 10)):
                if b >= scale:
                    return f"{sign}{b / scale:.1f} {unit}"
            return f"{sign}{b} B"

        def walk(span, prefix, is_last):
            branch = "└─" if is_last else "├─"
            mem = f"  {hmem(span.mem_delta)}" if span.mem_delta else ""
            lines.append(f"{prefix}{branch} {span.name:<28}"
                         f" {human(span.elapsed)}{mem}")
            ext = "   " if is_last else "│  "
            for i, child in enumerate(span.children):
                walk(child, prefix + ext, i == len(span.children) - 1)

        for i, child in enumerate(self.root.children):
            walk(child, "", i == len(self.root.children) - 1)
        return "\n".join(lines)


GLOBAL = SpanTree()
span = GLOBAL.span
