"""Stop-rule semantics, including the Weibull predicted-iteration rule.

Golden values for the Weibull math are hand-computed from the
reference's formulas (/root/reference/stoprule.cpp:434-443 cmpMuy,
:516-521 cmpUpperTime) — see the worked numbers in each test.
"""

import math

import numpy as np
import pytest

from iqtree_tpu.search.stoprule import (
    StopRule,
    predicted_extinct_iteration,
    predicted_upper_iteration,
)


def test_unsuccess_default():
    sr = StopRule(unsuccess_iteration=5)
    for _ in range(4):
        sr.iteration_done(improved=False)
    assert not sr.should_stop()
    sr.iteration_done(improved=True)
    for _ in range(4):
        sr.iteration_done(improved=False)
        assert not sr.should_stop()
    sr.iteration_done(improved=False)
    assert sr.should_stop()


def test_fixed_iterations():
    sr = StopRule(fixed_iterations=3)
    sr.iteration_done(True)
    sr.iteration_done(True)
    assert not sr.should_stop()
    sr.iteration_done(True)
    assert sr.should_stop()


def test_weibull_upper_hand_computed():
    # times newest-first: [100, 80, 50, 20], confidence 0.95
    # muy = (ln((100-20)/(100-80)) + ln((100-20)/(100-50))) / 3
    #     = (ln 4 + ln 1.6) / 3
    # priSu = -ln(0.05)/4;  su = priSu^(-muy)
    # upper = 100 + (100-20)/(su-1)
    times = [100.0, 80.0, 50.0, 20.0]
    muy = (math.log(4.0) + math.log(1.6)) / 3.0
    pri_su = -math.log(0.05) / 4.0
    su = pri_su ** (-muy)
    expect = 100.0 + 80.0 / (su - 1.0)
    got = predicted_upper_iteration(times, 0.95)
    assert got == pytest.approx(expect, rel=1e-12)
    # sanity: prediction extends beyond the last improvement
    assert got > times[0]


def test_weibull_extinct_blue_properties():
    # The BLUE weights sum to 1 (unbiasedness of a location estimate),
    # so a constant record sequence maps to that constant.
    times = [100.0, 80.0, 50.0, 20.0, 10.0]
    ext = predicted_extinct_iteration(times)
    assert np.isfinite(ext)
    from iqtree_tpu.search.stoprule import _cmp_muy  # noqa

    # weights-sum-to-one check via an affine shift: T + c -> ext + c'
    # (muy changes only with spacings, which are shift-invariant)
    ext_shift = predicted_extinct_iteration([t + 7.0 for t in times])
    assert ext_shift == pytest.approx(ext + 7.0, rel=1e-8)


def test_weibull_stoprule_flow():
    sr = StopRule(weibull=True, max_iterations=500, min_iterations=0,
                  confidence=0.95)
    # no prediction before 4 improvements: stops only past min_iterations
    assert sr.predicted_iteration == 0.0
    # drive improvements at iterations 20, 50, 80, 100
    for it in range(1, 101):
        sr.iteration_done(improved=it in (20, 50, 80, 100))
    assert sr.predicted_iteration > 0
    expect = min(500.0, predicted_upper_iteration([100.0, 80.0, 50.0, 20.0]))
    assert sr.predicted_iteration == pytest.approx(expect)
    assert not sr.should_stop()
    while sr.cur_iteration <= sr.predicted_iteration:
        sr.iteration_done(improved=False)
    assert sr.should_stop()


def test_weibull_clamps_to_max():
    sr = StopRule(weibull=True, max_iterations=105, confidence=0.95)
    for it in range(1, 101):
        sr.iteration_done(improved=it in (20, 50, 80, 100))
    assert sr.predicted_iteration == 105.0


def test_state_roundtrip():
    sr = StopRule(weibull=True, max_iterations=500)
    for it in range(1, 101):
        sr.iteration_done(improved=it in (20, 50, 80, 100))
    st = sr.state()
    sr2 = StopRule(weibull=True, max_iterations=500)
    sr2.restore(st)
    assert sr2.predicted_iteration == sr.predicted_iteration
    assert sr2.improved_iterations == sr.improved_iterations
    assert sr2.cur_iteration == sr.cur_iteration
