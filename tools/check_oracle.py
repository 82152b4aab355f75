#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare loop (dev tool only;
the shipped Scala library has no Python dependency).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>, sorts columns by name, and compares values exactly
(floats: also reports max abs diff so near-misses are visible).

With a third arg, also writes the machine-readable per-query record
{"sf": ..., "results": {name: {"status": "ok"|"fail", "rows": N,
"detail": ...}}, "ok": n, "failed": n} to that path — the committable
round-close correctness artifact (CORRECTNESS_LOCAL_r<N>.json,
VERDICT r9 ask #1), so the round's hard signal survives even if the
driver-side CORRECTNESS file is lost.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir, json_out=None):
    record = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # VT-parity lint (ADVICE r3): Java's regex \s matches the vertical tab
    # (0x0B); DuckDB's RE2 \s does not. Any oracle that writes a bare \s
    # instead of the explicit class [ \t\n\r\f\x0B] silently diverges from
    # the Spark side on VT-containing text, so reject it outright.
    import re as _re
    for name, sql in sorted(oracle.items()):
        if _re.search(r"\\s", sql):
            print(f"FAIL {name}: oracle SQL uses bare \\s (RE2 \\s != Java \\s on "
                  f"vertical tab) — use the explicit class from TextStats.wsClassSql")
            record[name] = {"status": "fail", "rows": 0, "detail": "bare \\s in oracle SQL"}
            n_bad += 1
    for name, sql in sorted(oracle.items()):
        if name in record:  # lint-failed above; don't overwrite the verdict
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            sn = list(spark_rel.columns)
            st = {c: str(t) for c, t in zip(sn, spark_rel.types)}
            sdata = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            dn = list(duck_rel.columns)
            dt = {c: str(t) for c, t in zip(dn, duck_rel.types)}
            ddata = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            record[name] = {"status": "fail", "rows": 0, "detail": f"exec error: {e}"}
            n_bad += 1
            continue
        if sorted(sn) != sorted(dn):
            print(f"FAIL {name}: column names differ: spark={sorted(sn)} duck={sorted(dn)}")
            record[name] = {"status": "fail", "rows": len(sdata), "detail": "column names differ"}
            n_bad += 1
            continue
        # Driver-hash sensitivity: its canonicalization is dtype-sensitive
        # (DECIMAL vs DOUBLE, HUGEINT vs BIGINT hash differently even when
        # value-equal) and its pandas sort_values crashes on array columns.
        # These are the relations' LOGICAL types (DuckDBPyType strings) —
        # DBAPI cursor codes collapse all numerics to NUMBER and would wave
        # exactly those mismatches through (ADVICE r2).
        tmis = [c for c in st if st[c] != dt[c]]
        if tmis:
            print(f"FAIL {name}: dtype mismatch (driver hash would differ): "
                  + ", ".join(f"{c}: spark={st[c]} duck={dt[c]}" for c in tmis))
            record[name] = {"status": "fail", "rows": len(sdata), "detail": "dtype mismatch: " + ",".join(tmis)}
            n_bad += 1
            continue
        arrs = [c for c in sn if "[]" in st[c] or "list" in st[c].lower()]
        if arrs:
            print(f"FAIL {name}: array-typed output {arrs} (driver pandas sort crashes)")
            record[name] = {"status": "fail", "rows": len(sdata), "detail": f"array-typed output {arrs}"}
            n_bad += 1
            continue
        sperm = sorted(range(len(sn)), key=lambda i: sn[i])
        dperm = sorted(range(len(dn)), key=lambda i: dn[i])
        srows = [tuple(norm(r[i]) for i in sperm) for r in sdata]
        drows = [tuple(norm(r[i]) for i in dperm) for r in ddata]
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count spark={len(srows)} duck={len(drows)}")
            record[name] = {"status": "fail", "rows": len(srows), "detail": f"row count spark={len(srows)} duck={len(drows)}"}
            n_bad += 1
            continue
        mismatch = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        # also try order-insensitive compare to distinguish sort-only issues
        if mismatch:
            sorted_eq = sorted(srows) == sorted(drows)
            i, a, b = mismatch[0]
            print(f"FAIL {name}: {len(mismatch)}/{len(srows)} rows differ "
                  f"(order-insensitive equal: {sorted_eq})\n  row {i}:\n   spark={a}\n   duck ={b}")
            record[name] = {"status": "fail", "rows": len(srows), "detail": f"{len(mismatch)}/{len(srows)} rows differ"}
            n_bad += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
            record[name] = {"status": "ok", "rows": len(srows)}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sf_dir, "ok": n_ok, "failed": n_bad,
                       "results": record}, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
