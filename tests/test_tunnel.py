"""utils/tunnel.py: bounded dark-tunnel probing (the guard that keeps
bench.py / __graft_entry__.py from wedging when the remote-TPU tunnel is
down).  Probes are injectable so these tests never touch a backend."""

import sys
import time

from bp_from_video_tpu.utils.tunnel import wait_for_tpu

PY = sys.executable


def test_probe_success_returns_immediately():
    t0 = time.monotonic()
    assert wait_for_tpu(total_wait_s=60, probe_timeout_s=30,
                        probe_cmd=[PY, "-c", "pass"])
    # Success means ONE probe, not the 60 s retry budget.  The bound is
    # generous: interpreter spawn alone can take several seconds when the
    # box is loaded (this flaked at <8 s during a 4-job round-5 session).
    assert time.monotonic() - t0 < 30


def test_probe_failure_exhausts_budget():
    t0 = time.monotonic()
    assert not wait_for_tpu(total_wait_s=3, probe_timeout_s=5, sleep_s=1,
                            probe_cmd=[PY, "-c", "raise SystemExit(1)"])
    # Retried within the budget, then gave up — bounded well under the
    # per-probe timeout times many attempts.
    assert time.monotonic() - t0 < 15


def test_hanging_probe_is_killed_not_waited_on():
    t0 = time.monotonic()
    assert not wait_for_tpu(
        total_wait_s=2, probe_timeout_s=3, sleep_s=5,
        probe_cmd=[PY, "-c", "import time; time.sleep(60)"])
    assert time.monotonic() - t0 < 20
