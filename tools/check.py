#!/usr/bin/env python3
"""Local self-check harness mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
(after `sbt "runMain graft.Verify <sfDir> <outDir>"`)

Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name, and compares row multisets exactly.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def fresh_con(sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con

def main(sfdir, outdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        # fresh connection per query: the heavy all-pairs oracles
        # otherwise leave the shared allocator exhausted at larger SFs
        # and an unrelated later query flakes with a DuckDB OOM
        con = fresh_con(sfdir)
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            ref = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        m, r = canon(mine), canon(ref)
        if list(m.columns) != list(r.columns):
            print(f"[BAD ] {name}: columns {list(m.columns)} vs {list(r.columns)}")
            n_bad += 1; continue
        if len(m) != len(r):
            print(f"[BAD ] {name}: rows {len(m)} vs {len(r)}"); n_bad += 1; continue
        bad_cells = []
        for c in m.columns:
            a, b = m[c], r[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a.astype(str) == b.astype(str)))
            if neq.any():
                i = neq.idxmax()
                bad_cells.append((c, a[i], b[i], int(neq.sum())))
        if bad_cells:
            print(f"[BAD ] {name}: {bad_cells[:3]}"); n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(m)} rows"); n_ok += 1
        con.close()
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
