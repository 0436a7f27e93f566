"""Every registered query must PLAN on a default-conf SparkSession.

The correctness driver runs queries() on ITS session, not the engine's
``session.py`` factory — so any query whose plan silently depends on a
builder conf passes the local parity mirror and fails under the driver
(CORRECTNESS r12: `format_roundtrip_counts` needed
``spark.sql.python.filterPushdown.enabled`` which only session.py set).
This sweep closes the class: a subprocess builds a bare session (its own
JVM, so no conf inheritance from the pytest SparkContext) and forces
physical planning for all queries() entries.

Stream/CDC callables execute work internally while being constructed —
that runs on the bare session too, which is the point: the engine must
set every conf it needs on whatever session it is handed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_bare_conf_sweep.py")


def test_all_queries_plan_on_default_conf_session():
    proc = subprocess.run(
        [sys.executable, _WORKER],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"worker produced no report (rc={proc.returncode}):\n{proc.stderr[-4000:]}"
    report = json.loads(lines[-1])
    assert report["n"] > 250, f"sweep only covered {report['n']} queries"
    assert not report["failures"], (
        "queries that fail to plan on a default-conf session:\n"
        + "\n".join(f"--- {k}\n{v}" for k, v in report["failures"].items())
    )
