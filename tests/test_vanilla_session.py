"""Driver-parity guard: every workload must be CORRECT on a vanilla
``SparkSession.builder.getOrCreate()`` — the driver's correctness
harness builds its own unconfigured session (non-UTC timezone, no
Arrow/AQE/broadcast tuning, none of ``session.get_spark``'s confs).

Round 3 lost 13 green queries to exactly this class of bug (a
required parquet-reader conf lived only in ``get_spark``), so this
leg runs a representative slice of the registry through
``tools/check_correctness.py --vanilla-session`` in a SUBPROCESS
(a genuinely fresh JVM — an in-process ``newSession()`` would still
inherit shared-state defaults from the test session).

The slice is chosen for failure-mode coverage, not breadth:
- ``user_sessions``      — unix_micros over the events timestamp
                           (caught the round-4 TIMESTAMP_NTZ drift),
- ``hourly_counts_tweets_egypt`` — tz-sensitive timestamp rendering
                           and re-parsing through the staged TSV,
- ``asof_join``          — temporal family over the events table,
- ``streaming_hourly_counts`` — Structured Streaming + event-time
                           on an unconfigured session.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_QUERIES = (
    "user_sessions,hourly_counts_tweets_egypt,asof_join,streaming_hourly_counts,"
    # round-5 event-time additions: week truncation and the dense
    # calendar axis are exactly the operations a non-UTC session skews
    "cohort_retention,dense_hourly_counts"
)


@pytest.mark.slow
def test_vanilla_session_driver_parity():
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "check_correctness.py"),
            "--sf",
            "0.001",
            "--vanilla-session",
            "--only",
            _QUERIES,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(REPO),
    )
    # the harness's last stdout line is a {"query": "OK"|...} summary
    summary = None
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            summary = json.loads(line)
            break
    assert summary is not None, (
        f"no summary line from check_correctness\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    bad = {k: v for k, v in summary.items() if v != "OK"}
    assert not bad and proc.returncode == 0, (
        f"vanilla-session mismatches: {bad}\n"
        f"stdout tail: {proc.stdout[-2000:]}"
    )
