#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir under verifyOutDir, runs oracle_sql.json[<name>]
in DuckDB against views over <sfDir>/*.parquet, canonicalizes both results
(columns sorted by name, rows sorted, floats rounded), and diffs.

Dev tool only — the engine itself has no Python/DuckDB dependency.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        return str(v)

    out = [tuple(cv(r[i]) for i in order) for r in rows]
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver-generated sf dirs hold single-file tables; ad-hoc
        # Spark-written ones (e.g. the sf1 copy) hold directories
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols, d_rows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_bad += 1
            continue
        cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if cs == cd:
            print(f"OK   {name}  ({len(cs)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows spark={len(cs)} duck={len(cd)}")
            for a, b in list(zip(cs, cd))[:2000]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
