"""Dispatch-stall watchdog (failure detection, SURVEY §5).

On the remote-tunnel TPU a worker restart leaves an in-flight dispatch
blocked forever: the host thread sits in `np.asarray(...)` on a futex with
zero signal (observed live in round 5 — a 300k-iter run froze at iter
178000 with the relay socket still ESTABLISHED; only an external probe
revealed the chip had already recovered and the grant was lost). A thread
cannot un-block XLA, but it CAN say loudly that the dispatch is stuck,
since when, and at what iteration — so an operator or wrapper script can
probe the chip and restart from the latest checkpoint (resume is bit-exact,
see test_resume).

The reference has no equivalent (its trainer is synchronous CUDA;
ref: exp_runner_blending.py:253-447 has no liveness signal either).
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Optional

log = logging.getLogger(__name__)


class StallWatchdog:
    """Warn (repeatedly) when `beat()` hasn't been called for `warn_s`.

    Usage:
        wd = StallWatchdog(warn_s=600, tag_fn=lambda: f"iter {step}")
        wd.start()
        try:
            for ...:
                dispatch(); wd.beat()
        finally:
            wd.stop()
    """

    def __init__(
        self,
        warn_s: float,
        tag_fn: Optional[Callable[[], str]] = None,
        on_warn: Optional[Callable[[float, str], None]] = None,
        poll_s: Optional[float] = None,
    ) -> None:
        self.warn_s = float(warn_s)
        self._tag_fn = tag_fn or (lambda: "")
        self._on_warn = on_warn or self._default_warn
        self._poll_s = poll_s if poll_s is not None else min(60.0, self.warn_s / 4)
        self._stop = threading.Event()
        self._last = time.monotonic()
        self._warned_at = 0.0  # stall length at the last warning
        self._thread: Optional[threading.Thread] = None

    @staticmethod
    def _default_warn(stalled_s: float, tag: str) -> None:
        log.warning(
            "no dispatch progress for %.0f s%s — the TPU worker may have "
            "restarted and dropped the in-flight RPC (the host thread then "
            "blocks forever). Probe the chip from a NEW process; if it "
            "answers, kill this one and resume from the latest checkpoint.",
            stalled_s, f" ({tag})" if tag else "",
        )

    def beat(self) -> None:
        self._last = time.monotonic()
        self._warned_at = 0.0

    def start(self) -> "StallWatchdog":
        if self.warn_s <= 0:  # disabled
            return self
        self._thread = threading.Thread(
            target=self._run, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self._poll_s + 1.0)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            stalled = time.monotonic() - self._last
            # re-warn each additional warn_s of stall, not every poll
            if stalled >= self.warn_s and stalled - self._warned_at >= self.warn_s:
                self._warned_at = stalled
                try:
                    tag = self._tag_fn()
                except Exception:  # the tag must never kill the watchdog
                    tag = "?"
                self._on_warn(stalled, tag)
