"""Search stop conditions.

Equivalent of StopRule (/root/reference/stoprule.h:30, tools.h:369):
unsuccessful-iteration count (default, SC_UNSUCCESS_ITERATION with 100
iterations), fixed iteration count, wall-clock limit, the Weibull
predicted-iteration rule (`-sr`, SC_WEIBULL), and the UFBoot
correlation hook (checked externally every step_iterations).

The Weibull prediction ports the reference's math exactly
(/root/reference/stoprule.cpp:178-521): treat the improved-iteration
numbers as record times of an extinction process; estimate the Weibull
shape from the spacing ratios (cmpMuy, stoprule.cpp:434), and stop at
the (1-confidence) upper prediction bound for the next improvement
(cmpUpperTime, stoprule.cpp:516).  The BLUE extinct-time estimate
(cmpExtinctTime via the Gamma-moment matrix, stoprule.cpp:446-509) is
computed for parity/reporting although — as in the reference — only the
upper bound drives stopping.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from math import exp, lgamma, log
from typing import List, Optional

import numpy as np


def _cmp_muy(times: List[float]) -> float:
    """Weibull shape estimate from record spacings; times is
    most-recent-first (reference cmpMuy, stoprule.cpp:434-443)."""
    k = len(times)
    s = 0.0
    for i in range(k - 2):
        s += log((times[0] - times[k - 1]) / (times[0] - times[i + 1]))
    return s / (k - 1.0)


def predicted_upper_iteration(times: List[float], confidence: float = 0.95) -> float:
    """Upper (1-confidence) prediction bound for the next improvement
    (cmpUpperTime, stoprule.cpp:516-521); times most-recent-first."""
    k = len(times)
    muy = _cmp_muy(times)
    pri_su = -log(1.0 - confidence) / k
    su = pri_su ** (-muy)
    return times[0] + (times[0] - times[k - 1]) / (su - 1.0)


def predicted_extinct_iteration(times: List[float]) -> float:
    """BLUE of the extinction time (cmpExtinctTime via the Gamma-moment
    matrix, stoprule.cpp:446-509); times most-recent-first."""
    k = len(times)
    muy = _cmp_muy(times)
    i = np.arange(k, dtype=np.float64)
    lam = np.empty((k, k))
    for a in range(k):
        for b in range(a + 1):
            v = exp(
                lgamma(2 * muy + a + 1)
                + lgamma(muy + b + 1)
                - lgamma(muy + a + 1)
                - lgamma(b + 1)
            )
            lam[a, b] = v
            lam[b, a] = v
    inv = np.linalg.inv(lam)
    e = np.ones(k)
    denom = e @ inv @ e
    a_vec = (inv @ e) / denom
    return float(a_vec @ np.asarray(times, dtype=np.float64))


@dataclass
class StopRule:
    unsuccess_iteration: int = 100  # tools.cpp:879
    min_iterations: int = 0
    max_iterations: int = 1000000
    max_seconds: Optional[float] = None
    fixed_iterations: Optional[int] = None  # -n option: SC_FIXED_ITERATION
    weibull: bool = False  # -sr option: SC_WEIBULL
    confidence: float = 0.95  # params.stop_confidence

    cur_iteration: int = 0
    last_improved_iteration: int = 0
    improved_iterations: List[int] = field(default_factory=list)  # newest first
    predicted_iteration: float = 0.0
    start_time: float = field(default_factory=time.time)

    def iteration_done(self, improved: bool) -> None:
        self.cur_iteration += 1
        if improved:
            self.last_improved_iteration = self.cur_iteration
            self._add_improved(self.cur_iteration)

    def _add_improved(self, iteration: int) -> None:
        """addImprovedIteration (stoprule.cpp:186-199): record the
        iteration and refresh the Weibull prediction (needs >= 4
        records), clamped to [min_iterations, max_iterations]."""
        self.improved_iterations.insert(0, iteration)
        if not self.weibull or len(self.improved_iterations) < 4:
            return
        pred = predicted_upper_iteration(
            self.improved_iterations, self.confidence
        )
        pred = min(pred, float(self.max_iterations))
        pred = max(pred, float(self.min_iterations))
        self.predicted_iteration = pred

    def should_stop(self) -> bool:
        if self.max_seconds is not None:
            # wall clocks diverge between hosts in a multi-host run: the
            # decision must be global or the SPMD programs desynchronize
            # (the PLL-MPI analogue of the master's stop broadcast,
            # pll/genericParallelization.c:105-282).  sync_global_flag is
            # a no-op single-process.
            from ..parallel.multihost import sync_global_flag

            hit = (time.time() - self.start_time) >= self.max_seconds
            if sync_global_flag(hit):
                return True
        if self.fixed_iterations is not None:
            return self.cur_iteration >= self.fixed_iterations
        if self.cur_iteration >= self.max_iterations:
            return True
        if self.weibull:
            # meetStopCondition SC_WEIBULL (stoprule.cpp:255-260)
            if self.predicted_iteration == 0:
                return self.cur_iteration > self.min_iterations
            return self.cur_iteration > self.predicted_iteration
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
            "improved_iterations": list(self.improved_iterations),
            "predicted_iteration": self.predicted_iteration,
        }

    def restore(self, st: dict) -> None:
        self.cur_iteration = int(st.get("cur_iteration", 0))
        self.last_improved_iteration = int(st.get("last_improved_iteration", 0))
        self.improved_iterations = [
            int(x) for x in st.get("improved_iterations", [])
        ]
        self.predicted_iteration = float(st.get("predicted_iteration", 0.0))
