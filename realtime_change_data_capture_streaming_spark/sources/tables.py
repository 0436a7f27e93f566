"""Analytics-table scans (operator S1 family).

The reference's only batch scan is ``SELECT * FROM transactions LIMIT n``
over JDBC (``/root/reference/transaction_producer.py:33-39``); here the
equivalent is a parquet scan whose LIMIT / filters / projections Catalyst
pushes into the file source.  At 100 TB these tables would be
partitioned/bucketed parquet or Delta on object storage — the reader code
is identical, only the path changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at *any* scale factor — at
#: TPC-H geometry region/nation are constant-size and supplier/part/customer
#: grow far slower than lineitem/orders.  Used by operators to hint
#: ``F.broadcast`` where Catalyst's size estimate may be unavailable.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS); make sure any session (incl.
        # the driver's) can read it — the conf is dynamic, safe to set here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Normalize events.ts to session-TZ TimestampType (LTZ) whatever the
    # file carries: TIMESTAMP(NANOS) arrives as long (nanosAsLong in
    # session.py) and is truncated to micros; un-zoned micros arrive as
    # TIMESTAMP_NTZ (Spark 4 infers NTZ from parquet by default) and are
    # cast — same wall clock under the fixed UTC session zone, and
    # event-time operators (watermarks, session_window) require LTZ.
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # Scan-time numeric normalization: the driver regenerates the fixture
    # parquet between rounds and physical numeric types have drifted before
    # (see events.ts above).  A decimal(p,s) or float32 scalar arriving where
    # a double used to be would change downstream output types and break the
    # driver's representation-sensitive value hash even when values compare
    # equal.  Absorb the drift once, here, so every operator sees doubles.
    # (array<float> embeddings are left alone — both engines read them
    # natively and consumers cast at the output boundary.)
    for f in df.schema.fields:
        kind = f.dataType.typeName()
        if kind in ("decimal", "float"):
            df = df.withColumn(f.name, F.col(f.name).cast("double"))
    return df



def fixture_fingerprint(sf_dir: str, table: str) -> str:
    """12-hex CONTENT key for build-once caches derived from a fixture
    table (persisted ANN indexes, staged change events, LSH history
    index): path + size + mtime_ns + the parquet FOOTER bytes, so a
    regenerated fixture invalidates the cache instead of silently
    serving an artifact built on old data (the driver rewrites the
    fixture parquet between rounds).  The footer digest closes the
    mtime-preserving-swap hole (``cp -p``/rename of an equal-size
    regeneration keeps size+mtime but the footer — row-group offsets,
    column statistics, created_by — virtually always moves); reading
    the last 64 KiB is O(1) regardless of table size, so the key stays
    metadata-cost at any scale."""
    import hashlib
    import os

    src = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    st = os.stat(src)
    with open(src, "rb") as f:
        f.seek(max(0, st.st_size - 65536))
        tail = f.read(65536)
    return hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}|".encode() + tail
    ).hexdigest()[:12]


def build_once(root: str, build) -> str:
    """Cross-process-safe build-once cache publish.

    ``build(tmp_dir)`` writes the artifact into a PRIVATE sibling temp
    dir, which is then published under ``root`` with ONE atomic
    ``os.rename`` — two processes cold-starting the same cache key
    (parallel pytest workers, bench alongside a test run) each build
    privately and exactly one rename wins; the loser discards its copy
    and serves the winner's.  The old in-place protocol
    (``write.mode('overwrite')`` straight into ``root``) let the second
    writer delete the first one's committed files mid-read.  ``root`` is
    complete IFF it exists (plus the ``_SUCCESS`` sentinel for
    compatibility with dirs published by the old protocol)."""
    import os
    import shutil
    import time
    import uuid

    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return root
    tmp = f"{root}.build-{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    try:
        build(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
    except BaseException:
        # build() itself failed: never leak the private tmp dir
        # (ADVICE r12 — the old flow had no cleanup around build())
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, root)
    except OSError:
        # lost the publish race (or a legacy half-built root is in the
        # way): discard ours, wait for the winner's sentinel — bounded
        # at 60 s, not the old silent 600 s hang: a live winner already
        # has its sentinel inside tmp and finishes its rename in well
        # under that, so a longer wait only delays surfacing a dead
        # winner's corpse (ADVICE r12)
        shutil.rmtree(tmp, ignore_errors=True)
        for _ in range(120):
            if os.path.exists(done):
                return root
            time.sleep(0.5)
        raise RuntimeError(
            f"cache dir {root!r} exists but never completed after 60s — "
            "remove it and retry (likely a crashed builder or a "
            "pre-atomic-protocol leftover)"
        )
    return root


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries can run."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def scan_with_limit(spark: SparkSession, sf_dir: str, name: str, limit: int = 50) -> DataFrame:
    """S1 equivalent: bounded scan; Catalyst plans a GlobalLimit over the
    file scan instead of reading the table (``transaction_producer.py:35``)."""
    return load_table(spark, sf_dir, name).limit(limit)
