#!/usr/bin/env python3
"""Local oracle checker mimicking the driver: run graft.Verify first, then
compare each query's parquet against its DuckDB oracle SQL (columns sorted by
name, rows sorted by all columns, exact equality + max-abs-diff report)."""
import duckdb, json, sys, math

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["lineitem", "orders", "events", "documents", "embeddings", "part",
          "supplier", "customer", "nation", "region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

sqls = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(sqls.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        oracle = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails.append(name); continue
    try:
        spark = duckdb.sql(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fails.append(name); continue

    o = oracle[sorted(oracle.columns)].sort_values(sorted(oracle.columns)).reset_index(drop=True)
    s = spark[sorted(spark.columns)].sort_values(sorted(spark.columns)).reset_index(drop=True)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        fails.append(name); continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        fails.append(name); continue
    bad = False
    for c in o.columns:
        oc, sc = o[c], s[c]
        if oc.dtype.kind == 'f' or sc.dtype.kind == 'f':
            import numpy as np
            ocv, scv = oc.astype(float).values, sc.astype(float).values
            both_nan = np.isnan(ocv) & np.isnan(scv)
            eq = (ocv == scv) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(np.where(eq, 0, ocv - scv)))
                n_bad = int((~eq).sum())
                print(f"FAIL {name}.{c}: {n_bad} mismatches, maxdiff={d:.3e}")
                idx = int(np.argmax(~eq))
                print(f"   first: oracle={ocv[idx]!r} spark={scv[idx]!r} row={o.iloc[idx].to_dict()}")
                bad = True
        else:
            if not (oc.astype(str).values == sc.astype(str).values).all():
                n_bad = int((oc.astype(str).values != sc.astype(str).values).sum())
                print(f"FAIL {name}.{c}: {n_bad} value mismatches (non-float)")
                import numpy as np
                idx = int(np.argmax(oc.astype(str).values != sc.astype(str).values))
                print(f"   first: oracle={oc.iloc[idx]!r} spark={sc.iloc[idx]!r}")
                bad = True
    if bad:
        fails.append(name)
    else:
        print(f"OK   {name} ({len(o)} rows, {len(o.columns)} cols)")

print(f"\n{len(sqls) - len(fails)}/{len(sqls)} queries match", "FAILURES:" if fails else "")
for f in fails:
    print(" -", f)
sys.exit(1 if fails else 0)
