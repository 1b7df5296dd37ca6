#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: verify_local.py <sfDir> <outDir>
  1. assumes `sbt runMain graft.Verify <sfDir> <outDir>` already ran
  2. loads each <outDir>/<name> parquet (Spark result)
  3. runs <outDir>/oracle_sql.json's SQL in DuckDB over views named after
     the parquet tables in <sfDir>
  4. sorts columns by name, sorts rows, compares values; reports diffs.

Driver-side tooling only (python/duckdb are NOT used by the engine).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical repr so 1.0 == 1 comparisons don't spuriously fail
        return repr(v)
    return str(v)

def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = frame_rows(got)
        ec, er = frame_rows(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}; "
                  f"{len(diffs)} differing; first: "
                  f"{diffs[0] if diffs else (gr[-1] if len(gr)>len(er) else er[-1])}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
