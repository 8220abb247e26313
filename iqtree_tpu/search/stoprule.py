"""Search stop conditions.

Equivalent of StopRule (/root/reference/stoprule.h:30, tools.h:369):
unsuccessful-iteration count (default, SC_UNSUCCESS_ITERATION with 100
iterations), fixed iteration count, wall-clock limit, and the UFBoot
correlation hook (checked externally every step_iterations).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class StopRule:
    unsuccess_iteration: int = 100  # tools.cpp:879
    min_iterations: int = 0
    max_iterations: int = 1000000
    max_seconds: Optional[float] = None
    fixed_iterations: Optional[int] = None  # -n option: SC_FIXED_ITERATION

    cur_iteration: int = 0
    last_improved_iteration: int = 0
    start_time: float = field(default_factory=time.time)

    def iteration_done(self, improved: bool) -> None:
        self.cur_iteration += 1
        if improved:
            self.last_improved_iteration = self.cur_iteration

    def should_stop(self) -> bool:
        if self.fixed_iterations is not None:
            return self.cur_iteration >= self.fixed_iterations
        if self.max_seconds is not None and (
            time.time() - self.start_time
        ) >= self.max_seconds:
            return True
        if self.cur_iteration >= self.max_iterations:
            return True
        if self.cur_iteration < self.min_iterations:
            return False
        return (
            self.cur_iteration - self.last_improved_iteration
            >= self.unsuccess_iteration
        )

    def state(self) -> dict:
        return {
            "cur_iteration": self.cur_iteration,
            "last_improved_iteration": self.last_improved_iteration,
        }

    def restore(self, st: dict) -> None:
        self.cur_iteration = int(st.get("cur_iteration", 0))
        self.last_improved_iteration = int(st.get("last_improved_iteration", 0))
