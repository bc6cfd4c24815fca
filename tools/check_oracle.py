#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (BASELINE.md t2).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir, runs oracle_sql.json[name] in
DuckDB over the sfDir tables, sorts columns by name, sorts rows, and compares
values exactly. Driver-side helper only — not part of the library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. a ScaleUp replica): a directory of
            # part files rather than the driver's single-file layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows) {'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        exp = con.sql(oracle[name]).df()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        # dtype KIND mismatch (int vs float/object) is a driver hash-fail even
        # when values compare equal here: the driver stringifies values, and
        # 0 != 0.0 under that. DuckDB HUGEINT (un-cast sums) arrives as float64
        # or object through pandas — exactly the q11/q62 bug class.
        kind_bad = [c for c in g.columns if g[c].dtype.kind != e[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch on {kind_bad}: "
                  f"spark={[str(g[c].dtype) for c in kind_bad]} "
                  f"duck={[str(e[c].dtype) for c in kind_bad]}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex)[:500]}")
            # show first diff
            for c in g.columns:
                neq = ~(g[c].eq(e[c]) | (g[c].isna() & e[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"   col {c} row {i}: spark={g[c][i]!r} duck={e[c][i]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
