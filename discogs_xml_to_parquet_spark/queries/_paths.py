"""Scratch sink paths for round-trip queries.

Round-trip queries (CSV/JSON/ORC) write under the system temp dir and
read straight back. The round-1 version used one fixed path per
(tag, sf) with mode('overwrite') -- the same shared-mutable-path hazard
ADVICE r2 flagged on the XML fixture: a second process overwriting the
directory while this one's lazy read-back scan lists it yields
FileNotFoundException or a partial read. Each call now gets a fresh
mkdtemp directory (unique per process + call, so concurrent drivers and
pytest workers never collide). The creating PID is embedded in the
directory name; stale siblings are reaped only once their creator is
dead (ADVICE r3: an age-only reaper could delete a >1h-old dir whose
still-running creator re-evaluates a lazy read-back scan later). Dirs
without a parseable PID (pre-r4 layout) get a 24h fuse instead, and a
7-day hard ceiling applies even to PID-alive dirs so a recycled PID
cannot make a stale dir immortal (ADVICE r4).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import time

_PREFIX = "sparkgraft_sink_"
_PID_RE = re.compile(rf"^{_PREFIX}p(\d+)_")
_REAP_AGE_SEC = 3600
_REAP_AGE_NO_PID_SEC = 24 * 3600
# Hard ceiling regardless of PID liveness (ADVICE r4: _pid_alive treats
# EPERM / recycled PIDs as alive, so a stale dir whose embedded PID was
# reused by an unrelated long-lived process would otherwise never be
# reaped). No legitimate sink dir lives for days -- they serve a single
# query's write-then-read round trip.
_REAP_AGE_HARD_SEC = 7 * 24 * 3600


def scratch_sink_dir(tag: str, sf_dir: str) -> str:
    """A unique, race-free output directory for one round-trip run."""
    base = tempfile.gettempdir()
    _reap_stale(base)
    sf = os.path.basename(sf_dir.rstrip("/"))
    return tempfile.mkdtemp(
        prefix=f"{_PREFIX}p{os.getpid()}_{tag}_{sf}_", dir=base
    )


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except OSError:
        pass  # e.g. EPERM: exists but not ours
    return True


def _reap_stale(base: str) -> None:
    now = time.time()
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith(_PREFIX):
            continue
        m = _PID_RE.match(name)
        if m and _pid_alive(int(m.group(1))):
            age_limit = _REAP_AGE_HARD_SEC  # PID reuse can't make it immortal
        else:
            age_limit = _REAP_AGE_SEC if m else _REAP_AGE_NO_PID_SEC
        path = os.path.join(base, name)
        try:
            if now - os.path.getmtime(path) > age_limit:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue
