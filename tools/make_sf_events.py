#!/usr/bin/env python3
"""Replicate the events table K times with key offsets (companion to
graft.tools.MakeSf, which handles every other table in Spark).

events.parquet stores `ts` as physical TIMESTAMP(NANOS): Spark can
only read it via the nanosAsLong legacy coercion and cannot write it
back, so a Spark round-trip would silently change the storage type
that both graft.core.Tables.events and the DuckDB oracle key on.
pyarrow preserves timestamp[ns] bit-for-bit.

Usage: python3 tools/make_sf_events.py <srcSfDir> <dstDir> <k>
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
t = pq.read_table(f"{src}/events.parquet")
ev_span = pc.max(t["event_id"]).as_py() + 1
usr_span = pc.max(t["user_id"]).as_py() + 1

copies = []
for i in range(k):
    c = t
    if i > 0:
        c = c.set_column(c.column_names.index("event_id"), "event_id",
                         pc.add(c["event_id"], i * ev_span))
        c = c.set_column(c.column_names.index("user_id"), "user_id",
                         pc.add(c["user_id"], i * usr_span))
    copies.append(c)
out = pa.concat_tables(copies)
pq.write_table(out, f"{dst}/events.parquet")
got = pq.read_schema(f"{dst}/events.parquet")
print(f"[makesf-events] {out.num_rows} rows, ts type: {got.field('ts').type}")
