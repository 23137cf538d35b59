#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare loop (dev tool only;
the engine itself is pure Scala/Spark). Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark result), runs <outDir>/oracle_sql.json
in DuckDB with fixture tables registered as views, sorts columns by name, and
diffs values. Exit 1 on any mismatch."""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: driver hashes values
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            duck_df = canon(con.sql(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        sv, dv = spark_df.values.tolist(), duck_df.values.tolist()
        bad = None
        for i, (r1, r2) in enumerate(zip(sv, dv)):
            for c, (x, y) in enumerate(zip(r1, r2)):
                # pandas converts to numpy types; normalize
                x = x.item() if hasattr(x, "item") else x
                y = y.item() if hasattr(y, "item") else y
                if isinstance(x, float) and isinstance(y, float):
                    ok = (math.isnan(x) and math.isnan(y)) or x == y
                else:
                    ok = str(x) == str(y)
                if not ok:
                    bad = (i, spark_df.columns[c], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"== {len(oracle) - n_fail}/{len(oracle)} pass ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
