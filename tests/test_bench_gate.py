"""The bench contamination gate must SEE a co-tenant (VERDICT r12 item 2).

r12's driver bench recorded 13.9 s ``contaminated: false`` while clean
re-runs of identical code measured 10.8-10.9 s — a load-10 co-tenant
slipped under the static ``own_load_max`` ceiling.  ``bench.py`` now
measures the co-tenant directly: CPU-seconds burned during the sweep by
live processes outside the bench's own process tree and outside the
kernel.  These tests pin the accounting itself:

- our own subprocesses (the Spark JVM's analogue) must NOT count;
- a process re-parented outside our tree (a true co-tenant) MUST count.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _foreign_cpu_jiffies


def _burn_script(seconds: float) -> str:
    return (
        "import time\n"
        f"end = time.time() + {seconds}\n"
        "while time.time() < end:\n"
        "    sum(i * i for i in range(10000))\n"
    )


def test_own_subprocess_cpu_is_not_foreign():
    """A CPU burner spawned as OUR child (like the Spark JVM) must not
    move the foreign counter by more than ambient daemon noise."""
    before = _foreign_cpu_jiffies()
    proc = subprocess.Popen([sys.executable, "-c", _burn_script(1.5)])
    try:
        proc.wait(timeout=30)
        after = _foreign_cpu_jiffies()
    finally:
        if proc.poll() is None:
            proc.kill()
    clk = os.sysconf("SC_CLK_TCK") or 100
    # ~1.5 CPU-s burned in-tree; allow 0.5 s of unrelated daemon drift
    assert (after - before) / clk < 0.5


def test_reparented_cotenant_cpu_is_foreign():
    """Double-fork a burner so it re-parents to init — the process-tree
    shape of a genuine co-tenant — and require the gate to charge it."""
    burn = 2.0
    pid = os.fork()
    if pid == 0:  # child: spawn the burner detached, then exit at once
        os.setsid()
        grandchild = subprocess.Popen(
            [sys.executable, "-c", _burn_script(burn + 10)],
            start_new_session=True,
        )
        os.write(1, f"{grandchild.pid}\n".encode())
        os._exit(0)
    # reap the child immediately: the grandchild re-parents to init/reaper
    os.waitpid(pid, 0)
    # the grandchild pid was printed to OUR stdout by the child — but we
    # can't capture it post-fork; find it by command line instead
    time.sleep(0.3)
    burner_pid = None
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "while time.time() < end" in cmd:
            burner_pid = int(entry)
            break
    assert burner_pid is not None, "detached burner not found in /proc"
    try:
        before = _foreign_cpu_jiffies()
        time.sleep(burn)
        after = _foreign_cpu_jiffies()
    finally:
        os.kill(burner_pid, signal.SIGKILL)
    clk = os.sysconf("SC_CLK_TCK") or 100
    # the burner spins flat-out; require at least half its wall time
    assert (after - before) / clk > burn / 2
