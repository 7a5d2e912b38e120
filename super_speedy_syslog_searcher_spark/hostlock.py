"""Host-exclusivity lock for benchmark vs test-suite serialization.

Round 4's third scaling attempt was self-polluted: the pytest suite was
still draining on the same host while the timed legs ran (BENCH.md,
"the third attempt"). The fix the round-5 brief asks for (VERDICT r4
#10) is mechanical exclusion, not discipline: every timed bench leg and
every pytest session takes the SAME flock, so a probe-gated run cannot
fire while the suite holds the host, and vice versa.

``flock`` (not a PID file): the lock dies with its holder, so a crashed
run never wedges the next one.
"""

from __future__ import annotations

import fcntl
import os
import time

LOCK_PATH = os.environ.get("S4SPARK_HOST_LOCK", "/tmp/s4spark_host.lock")


class HostLockTimeout(TimeoutError):
    pass


class HostLock:
    """``with HostLock("bench"):`` — exclusive host lease.

    ``timeout=None`` blocks indefinitely; a number raises
    :class:`HostLockTimeout` after that many seconds (callers that must
    not deadlock — the driver's bench entry — catch it and record the
    contention instead of silently timing a polluted window).
    """

    def __init__(self, label: str, timeout: float | None = None, poll_s: float = 0.5):
        self.label = label
        self.timeout = timeout
        self.poll_s = poll_s
        self._fh = None

    def __enter__(self) -> "HostLock":
        self._fh = open(LOCK_PATH, "a+")
        deadline = None if self.timeout is None else time.monotonic() + self.timeout
        while True:
            try:
                fcntl.flock(self._fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if deadline is not None and time.monotonic() >= deadline:
                    holder = self._read_holder()
                    self._fh.close()
                    self._fh = None
                    raise HostLockTimeout(
                        f"host lock held{holder} — refusing to time a contended window"
                    )
                time.sleep(self.poll_s)
        self._fh.seek(0)
        self._fh.truncate()
        self._fh.write(f"{self.label} pid={os.getpid()} t={time.time():.0f}\n")
        self._fh.flush()
        return self

    def _read_holder(self) -> str:
        try:
            self._fh.seek(0)
            txt = self._fh.read().strip()
            return f" by [{txt}]" if txt else ""
        except Exception:
            return ""

    def __exit__(self, *exc) -> None:
        if self._fh is not None:
            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
            self._fh = None
