#!/usr/bin/env python3
"""tools/check.py with a per-oracle wall-clock budget — the variant the
full-suite correctness-at-scale gate uses (dev tool only; the library
itself is pure Scala/Spark). Same compare as check.py; each oracle's
DuckDB run is interrupted past --timeout seconds and recorded as SLOW
(to be re-run individually or adjudicated) instead of wedging the whole
gate behind one pathological plan.

Usage: python3 tools/check_timed.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import sys, json, glob, threading, time

import duckdb

sys.path.insert(0, __import__("os").path.dirname(__file__))
from check import TABLES, canon  # noqa: E402


def main(sf_dir, out_dir, timeout=600.0):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_slow = 0
    slow = []
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            otypes = {r[0]: r[1] for r in con.execute("DESCRIBE " + sql).fetchall()}
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output", flush=True)
                n_fail += 1
                continue
            src = ("read_parquet([" +
                   ",".join(f"'{f}'" for f in files) + "])")
            stypes = {r[0]: r[1] for r in
                      con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()}
            dec = {c: t for c, t in {**otypes, **stypes}.items()
                   if "DECIMAL" in t or "HUGEINT" in t or "[]" in t}
            if dec:
                print(f"FAIL {name}: banned output column type(s) {dec}",
                      flush=True)
                n_fail += 1
                continue
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
            try:
                cur = con.execute(sql)
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
            finally:
                timer.cancel()
            scur = con.execute(f"SELECT * FROM {src}")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
            oc, orws = canon(ocols, orows)
            sc, srws = canon(scols, srows)
            dt = time.time() - t0
            if oc != sc:
                print(f"FAIL {name}: columns differ oracle={oc} spark={sc}",
                      flush=True)
                n_fail += 1
            elif orws != srws:
                print(f"FAIL {name}: rows differ (oracle {len(orws)} vs "
                      f"spark {len(srws)})", flush=True)
                o_set, s_set = set(orws), set(srws)
                for r in list(o_set - s_set)[:3]:
                    print(f"   oracle-only: {r}", flush=True)
                for r in list(s_set - o_set)[:3]:
                    print(f"   spark-only:  {r}", flush=True)
                n_fail += 1
            else:
                print(f"PASS {name} ({len(orws)} rows, {dt:.1f}s)", flush=True)
                n_pass += 1
        except duckdb.InterruptException:
            print(f"SLOW {name}: oracle exceeded {timeout:.0f}s, skipped",
                  flush=True)
            n_slow += 1
            slow.append(name)
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"SLOW {name}: oracle exceeded {timeout:.0f}s, skipped",
                      flush=True)
                n_slow += 1
                slow.append(name)
            else:
                print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
                n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_slow} slow ==", flush=True)
    if slow:
        print("slow: " + ",".join(slow), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
