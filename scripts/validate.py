#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/validate.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result parquet
in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted, exact value
equality (with a float near-miss report to distinguish logic bugs from ulp
drift).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, list):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(approx_equal(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            ora_rel = con.sql(sql)
            o_cols, o_rows = canon(ora_rel.fetchall(), ora_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        exact = s_rows == o_rows
        if exact:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
            continue
        # distinguish ulp drift from logic bugs
        mismatches = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        near = all(approx_equal(a, b) for a, b in mismatches)
        kind = "NEAR (float drift)" if near else "VALUES DIFFER"
        print(f"FAIL {name}: {kind}; first diff:\n  spark : {mismatches[0][0]}\n  oracle: {mismatches[0][1]}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"(+{len(set(TABLES)) and 0} ) oracle-less queries not checked here")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
