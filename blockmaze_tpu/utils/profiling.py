"""Nested block profiler — the framework's analogue of libff's
enter_block/leave_block (libff/common/profiling.hpp:43-46), which the
reference brackets around every prover/verifier phase.

Use as context manager or decorator; prints an indented wall-clock trace when
enabled (BMTPU_PROFILE=1 or profile.enable()). For device-side kernel traces
use jax.profiler alongside (this instruments the host-visible phases)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List


class BlockProfiler:
    def __init__(self):
        self.enabled = bool(os.environ.get("BMTPU_PROFILE"))
        self._depth = 0
        self.totals: Dict[str, float] = {}
        self._stack: List[tuple] = []

    def enable(self, on: bool = True):
        self.enabled = on

    @contextlib.contextmanager
    def block(self, name: str):
        if not self.enabled:
            yield
            return
        print("  " * self._depth + f"(enter) {name}", flush=True)
        self._depth += 1
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self._depth -= 1
            self.totals[name] = self.totals.get(name, 0.0) + dt
            print("  " * self._depth + f"(leave) {name}  [{dt:.3f}s]",
                  flush=True)

    def report(self) -> str:
        lines = ["block totals:"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {total:10.3f}s  {name}")
        return "\n".join(lines)


profiler = BlockProfiler()
enter_block = profiler.block  # usage: with enter_block("Compute H"): ...
