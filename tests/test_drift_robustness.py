"""Fixture-type-drift robustness.

The driver regenerates ``/root/testdata`` between rounds and physical
numeric types have drifted before (events.ts nanos->micros in round 3; the
round-3 ``fn_math`` hash failure was diagnosed as numeric-type drift).  The
engine-wide defense is:

  * Spark side: ``load_table`` / ``events_stream`` cast any decimal/float32
    scalar column to double at scan time, so every downstream operator sees
    the same types regardless of what the parquet carries.
  * Oracle side: every oracle SQL must cast numeric *outputs* to a canonical
    type (DOUBLE / BIGINT) so the driver's representation-sensitive value
    hash cannot change when the view's column types change underneath it.

This module simulates the drift: it rewrites the sf0.001 fixtures with every
float64 column as DECIMAL(18,6), then asserts (a) Spark scans still produce
doubles, (b) every oracle SQL still *plans* to drift-free output types on
the drifted views (planning only — cheap), and (c) the scalar-function
family still value-matches end-to-end on the drifted data.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod
from realtime_change_data_capture_streaming_spark.sources.tables import TABLES, load_table
from test_oracle_parity import _assert_equal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("drifted_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        cols = []
        for i, f in enumerate(tbl.schema):
            col = tbl.column(i)
            if pa.types.is_float64(f.type):
                col = pc.cast(col, pa.decimal128(18, 6))
            cols.append(col)
        drifted = pa.table(cols, names=tbl.schema.names)
        pq.write_table(drifted, d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def drift_duck(drift_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{drift_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_spark_scan_normalizes_drift(spark, drift_dir):
    """load_table absorbs decimal drift: no decimal/float32 survives the scan."""
    for t in TABLES:
        df = load_table(spark, drift_dir, t)
        for f in df.schema.fields:
            kind = f.dataType.typeName()
            assert kind not in ("decimal", "float"), (
                f"{t}.{f.name}: scan leaked drifted type {f.dataType.simpleString()}"
            )


def _bad_duck_types(rel) -> list[tuple[str, str]]:
    bad = []
    for name, t in zip(rel.columns, rel.types):
        s = str(t)
        # scalar DECIMAL / FLOAT outputs change the hashed representation
        # when the fixture types change; list<float> embeddings are native
        # fixture payloads read identically by both engines.  HUGEINT leaks
        # from SUM(BIGINT) promotion: values match Spark's bigint but the
        # driver hashes the int128 representation differently (r5 failures
        # dedup_simhash / events_psi_drift were exactly this class).
        if s.startswith("DECIMAL") or s in ("FLOAT", "HUGEINT", "UHUGEINT"):
            bad.append((name, s))
    return bad


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_sql_output_types_survive_drift(drift_duck, name):
    """Plan (not run) every oracle SQL against drifted views: output column
    types must stay canonical, i.e. every numeric output carries an explicit
    boundary cast.  This is the guard that one fixture regeneration cannot
    flip a green CORRECTNESS row red."""
    sql = entry_mod.oracle_sql()[name]
    rel = drift_duck.sql(sql)
    bad = _bad_duck_types(rel)
    assert not bad, (
        f"{name}: oracle output type would drift with fixture types: {bad} — "
        "add CAST(... AS DOUBLE/BIGINT) at the output boundary"
    )


FN_FAMILY = ("fn_string", "fn_math", "fn_date", "fn_array", "fn_conditional", "fn_map_json")


@pytest.mark.parametrize("name", FN_FAMILY)
def test_fn_family_parity_on_drifted_fixtures(spark, drift_duck, drift_dir, name):
    """End-to-end proof on the family that failed in round 3: Spark (drifted
    parquet, scan-normalized) vs DuckDB (drifted views, boundary casts)
    still produce cell-identical results."""
    got = entry_mod.queries()[name](spark, drift_dir).toPandas()
    want = drift_duck.execute(entry_mod.oracle_sql()[name]).df()
    _assert_equal(name, got, want)
