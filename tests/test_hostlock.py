"""Host lock (hostlock.py): mutual exclusion between bench and suite."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _env(lock_path: str) -> dict:
    return dict(os.environ, S4SPARK_HOST_LOCK=lock_path)


HOLDER = textwrap.dedent("""
    import sys, time
    sys.path.insert(0, %r)
    from super_speedy_syslog_searcher_spark.hostlock import HostLock
    with HostLock("holder"):
        print("HELD", flush=True)
        time.sleep(float(sys.argv[1]))
""") % str(Path(__file__).resolve().parents[1])


def test_second_acquire_times_out_while_held(tmp_path):
    lock_path = str(tmp_path / "host.lock")
    proc = subprocess.Popen(
        [sys.executable, "-c", HOLDER, "20"],
        env=_env(lock_path), stdout=subprocess.PIPE, text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        # fresh interpreter: flock is per-open-file, same-process re-locks succeed
        probe = subprocess.run(
            [sys.executable, "-c", HOLDER.replace('"holder"', '"probe", timeout=1'), "0"],
            env=_env(lock_path), capture_output=True, text=True, timeout=30,
        )
        assert probe.returncode != 0
        assert "host lock held" in probe.stderr
        assert "holder" in probe.stderr  # names the current holder
    finally:
        proc.kill()
        proc.wait()


def test_acquire_succeeds_after_release(tmp_path):
    lock_path = str(tmp_path / "host.lock")
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-c", HOLDER, "2"], env=_env(lock_path),
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        waiter = subprocess.run(
            [sys.executable, "-c", HOLDER.replace('"holder"', '"waiter", timeout=30'), "0"],
            env=_env(lock_path), capture_output=True, text=True, timeout=60,
        )
        assert waiter.returncode == 0  # blocked, then acquired
        assert time.time() - t0 >= 2  # only after the holder released
    finally:
        proc.wait()


def test_crashed_holder_does_not_wedge(tmp_path):
    lock_path = str(tmp_path / "host.lock")
    proc = subprocess.Popen(
        [sys.executable, "-c", HOLDER, "60"], env=_env(lock_path),
        stdout=subprocess.PIPE, text=True,
    )
    assert proc.stdout.readline().strip() == "HELD"
    proc.kill()
    proc.wait()
    after = subprocess.run(
        [sys.executable, "-c", HOLDER.replace('"holder"', '"after", timeout=5'), "0"],
        env=_env(lock_path), capture_output=True, text=True, timeout=30,
    )
    assert after.returncode == 0  # flock died with the holder
