#!/usr/bin/env python3
"""Dev-only oracle checker, mimicking the driver's DuckDB compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads each <name>/ parquet written by graft.Verify plus oracle_sql.json,
runs the oracle in DuckDB against the same source tables, and compares
row sets (sorted columns by name, sorted rows, values canonicalized).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Fence against silent disappearance (r6: 21 queries crashed at
    # plan time, wrote no output dir, and simply vanished from the
    # correctness file). Verify now writes _expected.json (every
    # attempted id) and _failed.json (id -> exception).
    # Any name in _failed.json FAILS unconditionally — even when a
    # stale dir from a previous run into the same outDir survives, a
    # crashed query must never PASS against old parquet. Expected ids
    # with no dir and no recorded exception also FAIL. Names failed
    # here are skipped by the oracle loop so one defect counts once.
    import os
    try:
        expected = json.load(open(f"{out_dir}/_expected.json"))
    except FileNotFoundError:
        expected = []
    try:
        failed_map = json.load(open(f"{out_dir}/_failed.json"))
    except FileNotFoundError:
        failed_map = {}
    fenced = set()
    for name in sorted(set(expected) | set(failed_map)):
        if name in failed_map:
            print(f"FAIL {name}: query crashed in Verify: "
                  f"{failed_map[name]}")
            fenced.add(name)
            n_fail += 1
        elif not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: MISSING from output set "
                  f"(no dir, no recorded exception)")
            fenced.add(name)
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if name in fenced:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = [c.lower() for c in duck_rel.columns]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # The driver converts DuckDB results via pandas, which renders
        # HUGEINT as float64 ("1234.0" vs Spark's "1234") — the hash
        # compare then fails even when values are identical. Any
        # HUGEINT output column (unpinned SUM(int)/window-SUM/
        # list_aggregate) must be CAST to BIGINT in the oracle SQL.
        # (This dev checker compares python ints, so it would pass —
        # fail loudly instead.)
        huge = [c for c, ty in zip(duck_rel.columns, duck_rel.types)
                if "HUGEINT" in str(ty).upper()]
        if huge:
            print(f"FAIL {name}: oracle output column(s) {huge} are "
                  f"HUGEINT — pin with CAST(... AS BIGINT) or the "
                  f"driver's pandas compare renders them float64")
            n_fail += 1
            continue
        # Same class of silent-typing trap, next most likely case:
        # `/` on DECIMAL returns DOUBLE in DuckDB while Spark keeps
        # DECIMAL (and vice versa for unpinned money math) — pandas
        # then renders "522.80" vs 522.8 and the driver's hash check
        # fails on identical values. Fence: the engine/oracle column
        # TYPE CLASSES must agree; decimal-vs-float gets the pointed
        # message.
        def tclass(ty):
            s = str(ty).upper()
            if "DECIMAL" in s:
                return "decimal"
            if s in ("FLOAT", "DOUBLE", "REAL"):
                return "float"
            if "INT" in s:
                return "int"
            return "other"
        duck_t = {c.lower(): tclass(ty)
                  for c, ty in zip(duck_rel.columns, duck_rel.types)}
        spark_t = {c.lower(): tclass(ty)
                   for c, ty in zip(spark_rel.columns, spark_rel.types)}
        clash = [(c, spark_t[c], duck_t[c]) for c in sorted(duck_t)
                 if c in spark_t and spark_t[c] != duck_t[c]]
        if clash:
            for c, st, dt in clash:
                hint = (" — DECIMAL `/` yields DOUBLE in DuckDB; pin "
                        "BOTH sides (CAST AS DOUBLE / Exact.dec2)"
                        if {st, dt} == {"decimal", "float"} else "")
            print(f"FAIL {name}: column type classes differ "
                  f"{clash}{hint}")
            n_fail += 1
            continue
        a, b = rowset(spark_cols, spark_rows), rowset(duck_cols, duck_rows)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif a != b:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: values differ, first diffs at {diff}:")
            for i in diff:
                print(f"  spark={a[i]}\n  duck ={b[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
