#!/usr/bin/env python3
"""Regenerate the committed golden files under src/test/resources/golden/.

The golden files are DuckDB-computed expected outputs for operator families
the DuckDB-SQL oracle gate cannot reach (streaming drains run a query
lifecycle, not a SQL statement). StreamingSpec compares the drained parquet
against these fixtures with an exact typed multiset compare — an EXTERNAL
engine's answer, not Spark checked against itself.

Usage: python3 tools/make_golden.py   (run from the repo root)

Purely a dev tool — the engine itself (Scala) never depends on this.
"""
import os
import duckdb

SF = "/root/testdata/sf0.001"
OUT = "src/test/resources/golden"

os.makedirs(OUT, exist_ok=True)

# Expected content of EventStream.drainToParquet(fromDirectory(events)) on
# the sf0.001 events table: every event row, with the partitioned sink's
# load_date (yyyyMMdd of ts) and the single AvailableNow batch's batch_id.
# ts is TIMESTAMP(NANOS) in the source; the stream normalizes to micros via
# `timestamp_micros(ts div 1000)` — DuckDB's ::TIMESTAMP is the same
# ns->us truncation.
duckdb.sql(f"""
COPY (
  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props,
         strftime(ts::TIMESTAMP, '%Y%m%d') AS load_date,
         0::BIGINT AS batch_id
  FROM '{SF}/events.parquet'
  ORDER BY event_id
) TO '{OUT}/events_drain_sf0001.parquet' (FORMAT PARQUET)
""")
print(f"wrote {OUT}/events_drain_sf0001.parquet")

# Expected content of the managed table after
# EventStream.drainToTable(fromDirectory(events)): the stream applies only
# the nanos->micros ts normalization — no load_date/batch_id (those belong
# to the partitioned parquet drain above).
duckdb.sql(f"""
COPY (
  SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props
  FROM '{SF}/events.parquet'
  ORDER BY event_id
) TO '{OUT}/events_table_drain_sf0001.parquet' (FORMAT PARQUET)
""")
print(f"wrote {OUT}/events_table_drain_sf0001.parquet")

# Expected output of EventStream.dedupedEvents (dropDuplicatesWithinWatermark
# on event_id) over a source holding TWO byte-identical copies of the events
# file: the duplicates land inside the watermark window, so each event_id
# survives exactly once — DuckDB's DISTINCT over the doubled union is the
# engine-neutral ground truth.
duckdb.sql(f"""
COPY (
  SELECT DISTINCT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props
  FROM (SELECT * FROM '{SF}/events.parquet'
        UNION ALL
        SELECT * FROM '{SF}/events.parquet')
  ORDER BY event_id
) TO '{OUT}/events_dedup_drain_sf0001.parquet' (FORMAT PARQUET)
""")
print(f"wrote {OUT}/events_dedup_drain_sf0001.parquet")
