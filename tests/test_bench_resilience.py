"""bench.py outage resilience: the probe/back-off/re-probe loop must
survive a transient tunnel drop and only give up after ~80% of the run
budget (round-3 verdict item 5 — a single fail-fast window erased the
round's driver-captured number over a drop that recovered 35 min later).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_device  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_transient_outage_recovers():
    """Tunnel down for the first few probes, then back: succeed."""
    clock = FakeClock()
    calls = []

    def probe(timeout):
        calls.append(timeout)
        clock.t += min(timeout, 60.0)  # each failed probe burns its window
        return clock.t > 150.0  # tunnel recovers after 150 "seconds"

    assert wait_for_device(540.0, probe=probe, sleep=clock.sleep,
                           clock=clock) is True
    assert len(calls) > 1  # it actually re-probed


def test_dead_tunnel_gives_up_at_80pct_budget():
    clock = FakeClock()

    def probe(timeout):
        clock.t += timeout  # every probe hangs to its timeout
        return False

    assert wait_for_device(540.0, probe=probe, sleep=clock.sleep,
                           clock=clock) is False
    # gave up once ~80% of the budget was spent, never (much) past it
    assert 0.8 * 540.0 - 60.0 <= clock.t <= 0.8 * 540.0 + 60.0


def test_immediate_contact_costs_one_probe():
    clock = FakeClock()
    n = []

    def probe(timeout):
        n.append(timeout)
        return True

    assert wait_for_device(540.0, probe=probe, sleep=clock.sleep,
                           clock=clock) is True
    assert len(n) == 1 and clock.t == 0.0


def test_last_probe_clipped_to_remaining_budget():
    clock = FakeClock()
    windows = []

    def probe(timeout):
        windows.append(timeout)
        clock.t += timeout
        return False

    wait_for_device(100.0, probe=probe, sleep=clock.sleep, clock=clock,
                    probe_timeout=60.0, backoff=15.0)
    # 80 s budget: first probe 60 s, sleep 15, final probe clipped to 5 s
    assert windows[0] == 60.0
    assert windows[-1] <= 60.0 and abs(sum(windows) + 15.0 - 80.0) < 1e-6
