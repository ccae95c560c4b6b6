#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Mirrors what the driver does with graft.Verify output: for each query in
oracle_sql.json, run the SQL in DuckDB over the sfDir parquet tables,
load the Spark result parquet, sort columns by name, sort rows, and
hash-compare values. Dev-only tooling — the Scala library has no
dependency on this.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql)
            ocols, orows = oracle.columns, oracle.fetchall()
            otypes = [str(t) for t in oracle.types]
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = spark.columns, spark.fetchall()
            stypes = [str(t) for t in spark.types]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            failed.append(name)
            continue
        # Type-strict: HUGEINT (uncast DuckDB window/list sums) vs Spark's
        # BIGINT hashes differently at the driver even when every value is
        # identical, so a type mismatch must fail LOCALLY too.
        omap = dict(zip(ocols, otypes))
        smap = dict(zip(scols, stypes))
        tdiff = {c: (omap[c], smap[c]) for c in ocols if omap[c] != smap[c]}
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}")
            failed.append(name)
            continue
        oc, sc = canon(orows, ocols), canon(srows, scols)
        if oc == sc:
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            diff = [(a, b) for a, b in zip(oc, sc) if a != b]
            print(f"FAIL {name}: {len(oc)} vs {len(sc)} rows, "
                  f"{len(diff)} differing; first: "
                  f"{diff[0] if diff else (oc[:1], sc[:1])}")
            failed.append(name)
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
