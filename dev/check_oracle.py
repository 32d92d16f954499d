#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Usage: python3 dev/check_oracle.py [sfDir] [outDir] [artifactJson]

When artifactJson is given, also writes a driver-format correctness
artifact ({query: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) — the committed CORRECTNESS_SELF_r*.json evidence
for rounds where the driver-side compare yields an empty artifact.

Assumes `graft.Verify` has already written <outDir>/<query>/ parquet and
<outDir>/oracle_sql.json. Registers the sfDir parquet tables as DuckDB
views, runs each oracle SQL, and compares against the Spark result:
columns sorted by name, rows compared in order and as sorted multisets.
"""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
artifact_path = sys.argv[3] if len(sys.argv) > 3 else None
artifact = {}

def record(name, *, rows_match=False, schema_match=False, hash_match=False,
           spark_rows=None, oracle_rows=None, err=None):
    artifact[name] = {"rows_match": rows_match, "schema_match": schema_match,
                      "hash_match": hash_match, "spark_rows": spark_rows,
                      "oracle_rows": oracle_rows, "err": err}

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.reset_index(drop=True)

n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  n_fail += 1
        record(name, err="no spark output");  continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
    except Exception as e:
        print(f"FAIL {name}: cannot read spark parquet: {e}");  n_fail += 1
        record(name, err=f"cannot read spark parquet: {e}"[:300]);  continue
    try:
        duck_df = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}");  n_fail += 1
        record(name, spark_rows=len(spark_df), err=f"oracle sql error: {e}"[:300]);  continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        n_fail += 1
        record(name, rows_match=len(spark_df) == len(duck_df),
               spark_rows=len(spark_df), oracle_rows=len(duck_df),
               err="column mismatch");  continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        n_fail += 1
        record(name, schema_match=True, spark_rows=len(spark_df),
               oracle_rows=len(duck_df), err="row count mismatch");  continue
    # The driver hashes stringified values: an int column on one side and a
    # float column on the other (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
    # pandas float64) hash-mismatches even when numerically equal. Mirror
    # that strictness: dtype KIND must agree column by column.
    kind_diff = [c for c in spark_df.columns
                 if (spark_df[c].dtype.kind in "iu") != (duck_df[c].dtype.kind in "iu")]
    if kind_diff:
        print(f"FAIL {name}: int/float dtype kind mismatch on {kind_diff} "
              f"(spark {[str(spark_df[c].dtype) for c in kind_diff]} vs "
              f"duck {[str(duck_df[c].dtype) for c in kind_diff]}) — "
              f"cast the oracle aggregate (e.g. ::BIGINT) to match")
        n_fail += 1
        record(name, rows_match=True, spark_rows=len(spark_df),
               oracle_rows=len(duck_df), err="dtype kind mismatch");  continue
    try:
        pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({len(spark_df)} rows)")
        n_pass += 1
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(spark_df), oracle_rows=len(duck_df))
    except AssertionError as e:
        # fall back: sorted-row multiset compare to distinguish order-only diffs
        s2 = spark_df.sort_values(by=list(spark_df.columns)).reset_index(drop=True)
        d2 = duck_df.sort_values(by=list(duck_df.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(s2, d2, check_dtype=False, check_exact=True)
            print(f"WARN {name}: values match but row ORDER differs")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(spark_df), oracle_rows=len(duck_df),
                   err="row order differs")
        except AssertionError:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            diff = spark_df.compare(duck_df) if spark_df.shape == duck_df.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(spark_df), oracle_rows=len(duck_df),
                   err="value mismatch")
        n_fail += 1

# queries without oracle: rows-only check
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"INFO {name}: no oracle, rows={n}")
        record(name, rows_match=n > 0, spark_rows=n, err="no oracle sql")

if artifact_path:
    json.dump(artifact, open(artifact_path, "w"), indent=1)
    print(f"wrote {artifact_path} ({len(artifact)} entries)")

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
