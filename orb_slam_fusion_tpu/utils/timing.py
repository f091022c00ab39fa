"""Per-stage timing instrumentation.

Reference parity: the REGISTER_TIMES machinery (include/config/settings.h:27
and the mTime_* fields in tracking.h:330-336) — per-frame wall-clock
accounting of preintegration / pose prediction / local-map tracking /
keyframe decision, plus the LBA counters in localmapping.cc:100-104.

Usage:
    from orb_slam_fusion_tpu.utils.timing import STAGES, stage
    with stage("pose_opt"):
        ...
    print(STAGES.report())

Zero overhead when disabled (the default): `stage()` returns a no-op
context manager unless STAGES.enabled.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageStats:
    def __init__(self):
        self.enabled = False
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.counters: Dict[str, int] = defaultdict(int)

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()
        self.counters.clear()

    def add(self, name: str, seconds: float) -> None:
        self.total[name] += seconds
        self.count[name] += 1

    def bump(self, name: str, n: int = 1) -> None:
        """Event counters (reference: num_FixedKF_BA / num_MPs_BA etc.)."""
        if self.enabled:
            self.counters[name] += n

    def report(self) -> str:
        lines = ["stage                  calls   total(s)   mean(ms)"]
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            c = self.count[name]
            t = self.total[name]
            lines.append(f"{name:<22} {c:>5}   {t:>8.3f}   {t/c*1000:>8.2f}")
        for name in sorted(self.counters):
            lines.append(f"{name:<22} {self.counters[name]:>5}")
        return "\n".join(lines)


STAGES = StageStats()


@contextlib.contextmanager
def stage(name: str):
    if not STAGES.enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        STAGES.add(name, time.perf_counter() - t0)
