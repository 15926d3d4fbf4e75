#!/usr/bin/env python3
"""Flatten a Spark-written SF directory (each table a `<t>.parquet/`
directory of part files) into single-file tables that BOTH engines
read — the layout the driver testdata uses and `tools/check.py`'s
DuckDB views expect (dev tool only; the library itself is pure
Scala/Spark).

Usage: python3 tools/flatten_sf.py <sparkSfDir> <flatOutDir>

The one schema fix-up: the synthesized `events` table carries `ts` as
BIGINT nanos (Spark reads the source's TIMESTAMP(NANOS) through
`nanosAsLong` and writes what it read). The flat copy converts it back
to TIMESTAMP_NS, so DuckDB oracles see the timestamp the real testdata
has and Spark (nanosAsLong) still reads Long nanos — bit-identical
semantics at any scale.
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(src_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{src_dir}/{t}.parquet/*.parquet"
        dst = f"{out_dir}/{t}.parquet"
        cols = {r[0]: r[1] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()}
        sel = "*"
        if t == "events" and cols.get("ts") == "BIGINT":
            sel = "* REPLACE (make_timestamp_ns(ts) AS ts)"
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"flattened {t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
