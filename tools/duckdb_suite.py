#!/usr/bin/env python3
"""Time the full DuckDB oracle suite on the same parquet tables the Spark
bench runs against — the bench-vs-baseline yardstick as a committed artifact
(BENCH_DUCKDB.json) instead of builder memory. Run graft.Verify first so
<out>/oracle_sql.json exists; the per-query SQL there IS the workload.

Usage: python3 tools/duckdb_suite.py [/tmp/verify_out] [/root/testdata/sf0.1]
"""
import duckdb, json, sys, time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

con = duckdb.connect()
for t in ["lineitem", "orders", "events", "documents", "embeddings", "part",
          "supplier", "customer", "nation", "region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

sqls = json.load(open(f"{OUT}/oracle_sql.json"))
queries, failed = {}, []
for name, sql in sorted(sqls.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        queries[name] = round(time.time() - t0, 3)
    except Exception as e:
        failed.append(name)
        print(f"FAIL {name}: {e}", file=sys.stderr)

sf = SF.rstrip("/").split("/")[-1]
result = {"metric": "duckdb_total", "value": round(sum(queries.values()), 2),
          "unit": "sec", "sf": sf, "n_queries": len(queries),
          "queries": queries}
if failed:
    result["failed"] = failed
with open("BENCH_DUCKDB.json", "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps({k: result[k] for k in ("metric", "value", "unit", "sf", "n_queries")}))
