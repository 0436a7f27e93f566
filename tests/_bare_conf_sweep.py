"""Worker for tests/test_default_conf_sweep.py — runs in its OWN process.

Builds a SparkSession with NO engine confs (no session.py helpers) — the
same posture as the correctness driver's session — and forces physical
planning for every registered queries() entry.  Any query whose PLAN only
works under builder confs (e.g. a Python DataSource reader implementing
pushFilters while ``spark.sql.python.filterPushdown.enabled`` is default
false — the CORRECTNESS r12 `format_roundtrip_counts` failure) fails here
loudly before the driver finds it.

Must be a separate process: ``SparkSession.newSession()`` inherits SQL
confs from the SparkContext conf, so a bare session cannot be made inside
the pytest JVM once the conftest session exists.

Prints one JSON line: {"failures": {name: "error"...}, "n": total}.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    sf_dir = os.environ.get("BARE_SWEEP_SF_DIR", "/root/testdata/sf0.001")
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    # intentionally NO SQL confs beyond master/app: default shuffle
    # partitions (200), python filterPushdown off, arrow default, etc.
    # spark.ui.enabled is a core (non-SQL) conf kept off to avoid port
    # grabbing under parallel pytest; it cannot affect planning.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bare-conf-sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = sorted(queries) if only is None else [n for n in sorted(queries) if n in only]
    failures: dict[str, str] = {}
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            # force analysis + optimization + physical planning (where
            # DataSource pushdown validation runs) without executing
            df._jdf.queryExecution().executedPlan()
        except Exception:
            failures[name] = traceback.format_exc(limit=4)
    print(json.dumps({"failures": failures, "n": len(names)}))
    spark.stop()


if __name__ == "__main__":
    main()
