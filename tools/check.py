#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate.

NOT part of the engine (driver-side python/duckdb only): runs each
oracle SQL from Verify's oracle_sql.json against DuckDB views over the
same parquet tables, and compares with the Spark result parquet written
by graft.Verify. Columns are aligned by sorted name, rows sorted, values
compared exactly (with a small float report threshold for diagnosis).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sfdir, outdir):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            du_rel = con.sql(sql)
            # Driver-hasher hazard: DuckDB returns HUGEINT for sum(BIGINT);
            # the driver hashes it as float (1.0 vs Spark's long 1) even when
            # every value is numerically identical. Parquet cannot carry these
            # types either, so their presence always means a missing CAST in
            # the oracle SQL.
            bad = [(c, str(t)) for c, t in zip(du_rel.columns, du_rel.types)
                   if str(t) in ("HUGEINT", "UHUGEINT")]
            if bad:
                print(f"FAIL {name}: oracle result has driver-unsafe types "
                      f"{bad} — add CAST(... AS BIGINT) in the oracle SQL")
                failures += 1
                continue
            du = du_rel.df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
        if sp_cols != du_cols:
            print(f"FAIL {name}: columns spark={sp_cols} duckdb={du_cols}")
            failures += 1
            continue
        sp = sp[sp_cols].sort_values(sp_cols, kind="mergesort").reset_index(drop=True)
        du = du[du_cols].sort_values(du_cols, kind="mergesort").reset_index(drop=True)
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} duckdb={len(du)}")
            failures += 1
            continue
        mism = []
        for c in sp_cols:
            a, b = sp[c].tolist(), du[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                x, y = canon(x), canon(y)
                if x != y and not (x is None and y is None) \
                        and str(x) != str(y):
                    mism.append((c, i, x, y))
                    if len(mism) > 5:
                        break
            if len(mism) > 5:
                break
        if mism:
            print(f"FAIL {name}: {len(mism)}+ value mismatches, e.g.:")
            for c, i, x, y in mism[:5]:
                d = abs(x - y) if isinstance(x, float) and isinstance(y, float) else ""
                print(f"   col={c} row={i} spark={x!r} duckdb={y!r} absdiff={d}")
            failures += 1
        else:
            print(f"PASS {name} ({len(sp)} rows, {len(sp_cols)} cols)")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
