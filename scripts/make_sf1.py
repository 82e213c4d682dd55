#!/usr/bin/env python3
"""Dev tool: build a ~sf1 dataset (10x sf0.1) under the repo for scale
cross-checks, preserving every physical type (incl. TIMESTAMP_NS on
events.ts, which Spark cannot write back).

Scaling strategy:
- events, lineitem, orders: 10 replicas with key offsets. The event_id
  offset is a multiple of lcm(500, 300, 100) * 137 so every marker-derived
  surrogate stream (DDL %500, task %300, position saves %100, op messages
  %137) keeps uniform density; the user_id offset is a multiple of 12 so
  channel (%4) and collection (%3) hashing is preserved. Order keys offset
  jointly in orders+lineitem so the join structure replicates.
- dimension-ish and content tables (customer, supplier, part, nation,
  region, documents, embeddings) are copied as-is: the text/vector suites
  are corpus-shaped (near-dup structure would degenerate into 10-cliques
  if texts were replicated verbatim), so their scale point stays sf0.1.

Usage: python3 scripts/make_sf1.py [src_dir] [dst_dir] [factor]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1")
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

COPY = ["customer", "supplier", "part", "nation", "region",
        "documents", "embeddings"]


def round_up(n, mult):
    return ((n + mult - 1) // mult) * mult


def replicate(table, offsets):
    """offsets: {column: per-replica offset}. Replica 0 is the original."""
    parts = [table]
    for i in range(1, FACTOR):
        cols = []
        for name in table.column_names:
            col = table.column(name)
            if name in offsets:
                col = pc.add(col, pa.scalar(offsets[name] * i, type=col.type))
            cols.append(col)
        parts.append(pa.table(cols, names=table.column_names))
    return pa.concat_tables(parts)


def main():
    DST.mkdir(parents=True, exist_ok=True)
    for t in COPY:
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

    ev = pq.read_table(SRC / "events.parquet")
    e_off = round_up(pc.max(ev.column("event_id")).as_py() + 1, 205500)
    u_off = round_up(pc.max(ev.column("user_id")).as_py() + 1, 12)
    pq.write_table(replicate(ev, {"event_id": e_off, "user_id": u_off}),
                   DST / "events.parquet")

    orders = pq.read_table(SRC / "orders.parquet")
    li = pq.read_table(SRC / "lineitem.parquet")
    o_off = max(pc.max(orders.column("o_orderkey")).as_py(),
                pc.max(li.column("l_orderkey")).as_py()) + 1
    pq.write_table(replicate(orders, {"o_orderkey": o_off}),
                   DST / "orders.parquet")
    pq.write_table(replicate(li, {"l_orderkey": o_off}),
                   DST / "lineitem.parquet")
    print(f"wrote {DST}: events x{FACTOR} (e_off={e_off}, u_off={u_off}), "
          f"orders/lineitem x{FACTOR} (o_off={o_off}), {len(COPY)} copied")


if __name__ == "__main__":
    main()
