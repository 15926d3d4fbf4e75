#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
library itself is pure Scala/Spark).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over
views named after the parquet tables in <sfDir>, loads the Spark result
parquet from <verifyOutDir>/<name>/, then compares: columns sorted by
name, rows sorted, values normalized (Decimal normalize, float repr,
datetime isoformat).
"""
import sys, json, glob, decimal, datetime

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            otypes = {d[0]: str(d[1]) for d in cur.description}
            orows = cur.fetchall()
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            scur = con.execute(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])")
            scols = [d[0] for d in scur.description]
            stypes = {d[0]: str(d[1]) for d in scur.description}
            srows = scur.fetchall()
            oc, orws = canon(ocols, orows)
            sc, srws = canon(scols, srows)
            # The driver's hash is TYPE-sensitive (DECIMAL(28,2) vs
            # DECIMAL(38,2) is a fail even with identical values) — so
            # this local gate must compare result types too.
            if oc != sc:
                print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
                n_fail += 1
            elif otypes != stypes:
                diff = {c: (otypes[c], stypes[c]) for c in otypes
                        if otypes[c] != stypes.get(c)}
                print(f"FAIL {name}: types differ (oracle, spark) = {diff}")
                n_fail += 1
            elif orws != srws:
                print(f"FAIL {name}: rows differ (oracle {len(orws)} vs spark {len(srws)})")
                o_set, s_set = set(orws), set(srws)
                for r in list(o_set - s_set)[:3]:
                    print(f"   oracle-only: {r}")
                for r in list(s_set - o_set)[:3]:
                    print(f"   spark-only:  {r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(orws)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
