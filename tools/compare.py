#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
(optional query names restrict the compare — fast single-oracle iteration)

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sfDir parquet tables, sorts
columns by name and rows by all columns, and diffs values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    declared = set(oracle)
    if only:
        unknown = only - declared
        if unknown:
            print(f"ERROR: unknown query name(s): {sorted(unknown)}")
            sys.exit(2)
        declared = declared & only
        print(f"comparing {len(declared)} of {len(oracle)} oracle queries")
    for name in sorted(declared):
        mine_path = os.path.join(outdir, name)
        if not os.path.isdir(mine_path):
            print(f"FAIL {name}: no Spark output dir"); n_fail += 1; continue
        try:
            mine = canon(pd.read_parquet(mine_path))
            theirs = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(theirs.columns)}")
            n_fail += 1; continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} vs {len(theirs)}"); n_fail += 1; continue
        bad = []
        for c in mine.columns:
            a, b = mine[c].values, theirs[c].values
            if a.dtype != b.dtype and not (np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number)):
                try:
                    b = b.astype(a.dtype)
                except Exception:
                    bad.append((c, f"dtype {a.dtype} vs {b.dtype}")); continue
            eq = pd.Series(a).fillna("\0NULL") .eq(pd.Series(b).fillna("\0NULL")) \
                 if a.dtype == object else (pd.isna(a) & pd.isna(b)) | (a == b)
            neq = int((~np.asarray(eq)).sum())
            if neq:
                idx = int(np.argmax(~np.asarray(eq)))
                bad.append((c, f"{neq} diffs, first at row {idx}: {a[idx]!r} vs {b[idx]!r}"))
        if bad:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    # queries with Spark output but no oracle: the driver's weaker
    # rows-only check — readable and non-empty, or it fails
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        nm = os.path.basename(d)
        if only and nm not in only:
            continue
        if os.path.isdir(d) and nm not in declared:
            try:
                nrows = len(pd.read_parquet(d))
            except Exception as e:
                print(f"FAIL {nm}: rows-only output unreadable ({e})")
                n_fail += 1
                continue
            if nrows > 0:
                print(f"NOTE {nm}: rows-only ({nrows} rows, no oracle)")
            else:
                print(f"FAIL {nm}: rows-only output has 0 rows")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
