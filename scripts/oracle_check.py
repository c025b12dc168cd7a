#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [--time=OUT.json] [--out=RESULTS.json]

For each query output parquet under <verifyOutDir>/<name>/ and its SQL in
<verifyOutDir>/oracle_sql.json, run the SQL in DuckDB over views named after
the tables in <sfDir>, then compare: columns sorted by name, rows sorted by
all columns, values exact (tiny float tolerance reported separately).

With --time=OUT.json, additionally time each oracle query (min of 2 runs,
fully materialized via .df()) and write a per-query baseline JSON — the
published DuckDB reference for the "Spark within 2x per query" bar.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# The q39/q41/q130/q134 oracles express dot products as DuckDB's native
# list_inner_product, which was verified BIT-IDENTICAL to Spark's
# aggregate(zip_with(...)) sequential left fold under THIS version. That
# identity is empirical, not contractual: a DuckDB upgrade that reorders
# accumulation (pairwise/FMA) would shift the oracle by ulps and silently
# break hash-exactness. dot_sanity() below re-proves the identity against
# an explicit list_reduce fold on every run, so a drift is caught here —
# not absorbed into the oracle.
DUCKDB_PINNED = "1.0.0"


def dot_sanity(con, sf_dir: str) -> None:
    ver = duckdb.__version__
    if ver != DUCKDB_PINNED:
        print(f"WARN duckdb {ver} != pinned {DUCKDB_PINNED} — "
              f"re-verifying list_inner_product order-identity")
    p = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(p):
        return
    bad = con.sql(f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM '{p}' LIMIT 64)
        SELECT COUNT(*) FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v) <>
              list_reduce([0.0]::DOUBLE[] ||
                list_transform(range(1, len(a.v) + 1),
                               i -> a.v[i] * b.v[i]),
                (acc, x) -> acc + x)
    """).fetchone()[0]
    if bad:
        raise SystemExit(
            f"dot_sanity: list_inner_product diverges from the sequential "
            f"fold on {bad} pairs under duckdb {ver} — the q39/q41/q130/"
            f"q134 oracles are no longer bit-identical; re-pin or revert "
            f"to the fold formulation")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, res_json: str | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    dot_sanity(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # per-query outcome in the driver's CORRECTNESS_r{N} format
    results = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, 0, -1, "no spark output")
            n_fail += 1
            continue
        try:
            mine = canon(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record(name, False, False, False, -1, -1, str(e)[:200])
            n_fail += 1
            continue
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(want.columns)}")
            record(name, len(mine) == len(want), False, False,
                   len(mine), len(want), "column mismatch")
            n_fail += 1
            continue
        # Driver hashes the *encoded* values, so a dtype mismatch (e.g. DuckDB
        # HUGEINT vs Spark BIGINT) fails its gate even when values compare
        # equal — surface it here instead of discovering it in VERDICT.
        # Width differences (int32 vs int64) hash identically; kind
        # differences (int vs float/object, e.g. HUGEINT) do not.
        dt_mism = [(c, str(mine[c].dtype), str(want[c].dtype))
                   for c in mine.columns
                   if mine[c].dtype.kind != want[c].dtype.kind]
        if dt_mism:
            print(f"FAIL {name}: dtype mismatch {dt_mism}")
            record(name, len(mine) == len(want), False, False,
                   len(mine), len(want), f"dtype mismatch {dt_mism}"[:200])
            n_fail += 1
            continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} != {len(want)}")
            record(name, False, True, False, len(mine), len(want),
                   "row count mismatch")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(mine)} rows)")
            record(name, True, True, True, len(mine), len(want), None)
            n_pass += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(mine, want, check_dtype=False,
                                              rtol=1e-12, atol=1e-12)
                print(f"NEAR {name}: values differ only within 1e-12 "
                      f"(driver hash would FAIL)")
            except AssertionError as e2:
                print(f"FAIL {name}: {str(e2).splitlines()[-1][:200]}")
                mism = (mine != want) & ~(mine.isna() & want.isna())
                bad_cols = [c for c in mine.columns if mism[c].any()]
                for c in bad_cols[:3]:
                    i = mism[c].idxmax()
                    print(f"   {c}[{i}]: mine={mine[c][i]!r} want={want[c][i]!r}")
            record(name, True, True, False, len(mine), len(want),
                   "value mismatch")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if res_json:
        with open(res_json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"== wrote {res_json}: {len(results)} queries")
    return 1 if n_fail else 0


def time_oracle(sf_dir: str, out_dir: str, out_json: str, reps: int = 2) -> None:
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.sql(oracle[name]).df()
            except Exception as e:
                print(f"TIME-ERR {name}: {e}")
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 3)
            print(f"TIME {name} {best:.3f}s")
    doc = {"engine": "duckdb", "version": duckdb.__version__,
           "threads": os.cpu_count(), "reps": reps,
           "sf": sf_dir, "total_sec": round(sum(times.values()), 1),
           "queries": times}
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"== wrote {out_json}: {len(times)} queries, "
          f"total {doc['total_sec']}s")


if __name__ == "__main__":
    res_json = None
    for a in sys.argv[3:]:
        if a.startswith("--out"):
            res_json = a.split("=", 1)[1] if "=" in a else None
    rc = main(sys.argv[1], sys.argv[2], res_json)
    for a in sys.argv[3:]:
        if a.startswith("--time"):
            dest = a.split("=", 1)[1] if "=" in a else "BASELINE_duckdb.json"
            time_oracle(sys.argv[1], sys.argv[2], dest)
    sys.exit(rc)
