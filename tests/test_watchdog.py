"""StallWatchdog: fires after warn_s of silence, beat() resets it, and it
re-warns per additional warn_s (not per poll)."""

import time

from neuraludf_tpu.utils.watchdog import StallWatchdog


def test_watchdog_fires_and_resets():
    warns = []
    wd = StallWatchdog(
        warn_s=0.3,
        tag_fn=lambda: "iter 42",
        on_warn=lambda s, tag: warns.append((s, tag)),
        poll_s=0.05,
    ).start()
    try:
        # heartbeats keep it quiet
        for _ in range(4):
            time.sleep(0.1)
            wd.beat()
        assert warns == []

        # silence -> exactly one warning per warn_s of stall
        time.sleep(0.45)
        assert len(warns) == 1
        assert warns[0][0] >= 0.3
        assert warns[0][1] == "iter 42"

        # a beat resets; no immediate re-warn
        wd.beat()
        time.sleep(0.15)
        assert len(warns) == 1
    finally:
        wd.stop()


def test_watchdog_disabled():
    wd = StallWatchdog(warn_s=0, on_warn=lambda s, t: (_ for _ in ()).throw(
        AssertionError("must not warn")), poll_s=0.01).start()
    time.sleep(0.1)
    wd.stop()


def test_watchdog_rewarns_each_period():
    warns = []
    wd = StallWatchdog(warn_s=0.2, on_warn=lambda s, t: warns.append(s),
                       poll_s=0.05).start()
    try:
        time.sleep(0.7)
        assert len(warns) >= 2  # ~0.2s and ~0.4s (poll jitter tolerated)
    finally:
        wd.stop()
