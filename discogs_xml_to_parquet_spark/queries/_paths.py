"""Scratch sink paths for round-trip queries.

Round-trip queries (CSV/JSON/ORC) write under the system temp dir and
read straight back. The round-1 version used one fixed path per
(tag, sf) with mode('overwrite') -- the same shared-mutable-path hazard
ADVICE r2 flagged on the XML fixture: a second process overwriting the
directory while this one's lazy read-back scan lists it yields
FileNotFoundException or a partial read. Each call now gets a fresh
mkdtemp directory (unique per process + call, so concurrent drivers and
pytest workers never collide); stale siblings from earlier runs are
best-effort reaped once they are an hour old.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

_PREFIX = "sparkgraft_sink_"
_REAP_AGE_SEC = 3600


def scratch_sink_dir(tag: str, sf_dir: str) -> str:
    """A unique, race-free output directory for one round-trip run."""
    base = tempfile.gettempdir()
    _reap_stale(base)
    sf = os.path.basename(sf_dir.rstrip("/"))
    return tempfile.mkdtemp(prefix=f"{_PREFIX}{tag}_{sf}_", dir=base)


def _reap_stale(base: str) -> None:
    now = time.time()
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith(_PREFIX):
            continue
        path = os.path.join(base, name)
        try:
            if now - os.path.getmtime(path) > _REAP_AGE_SEC:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue
