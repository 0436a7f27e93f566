"""Structural invariants of the fixed-point PageRank (operators/graph.py).

The oracle parity check pins exact equality with the unrolled SQL replay;
these pin the algorithm-level contract: rank mass is conserved up to the
deliberate integer-floor losses, every node keeps at least the teleport
share, and hub nodes (suppliers, shared by many customers) out-rank leaf
nodes in aggregate.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_floor_invariants(spark):
    from realtime_change_data_capture_streaming_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        ITERATIONS,
        SCALE,
        graph_pagerank_purchases,
    )

    rows = graph_pagerank_purchases(spark, SF).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["rank_scaled"] for r in rows)
    # each of the ITERATIONS steps floors once per (edge contribution) and
    # once for the teleport term — mass can only shrink, and by less than
    # one unit per floor; a loose but sound bound is n floors per node
    # per iteration times a unit each, far below 1% of SCALE here
    assert total <= SCALE
    assert total >= SCALE * 0.99, f"mass leaked: {total} / {SCALE}"
    base = (DAMP_DEN - DAMP_NUM) * SCALE // (DAMP_DEN * n)
    assert all(r["rank_scaled"] >= base for r in rows), "teleport floor violated"
    # suppliers (odd ids) are hubs: mean supplier rank > mean customer rank
    sup = [r["rank_scaled"] for r in rows if r["node"] % 2 == 1]
    cust = [r["rank_scaled"] for r in rows if r["node"] % 2 == 0]
    assert sup and cust
    assert sum(sup) / len(sup) > sum(cust) / len(cust)
    _ = ITERATIONS  # imported to assert the constant stays exported
