#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate.

Runs each oracle SQL from ``<outDir>/oracle_sql.json`` in DuckDB against
the parquet test tables of a scale-factor dir, and compares with the
Spark result parquet written by ``graft.Verify``. Compare semantics match
the driver: sort columns by name, sort rows, hash values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With a third argument, also writes per-query records in the driver's
CORRECTNESS_r{N}.json format ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) — used to commit oracle
evidence at a second scale factor (e.g. CORRECTNESS_sf01.json).

This script is NOT part of the shipped library (the builder environment
allows python/duckdb driver-side only); it exists so oracle mismatches
are caught locally instead of burning a round.
"""
import sys, os, json, glob
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: tz-aware -> naive UTC; floats stay as-is (both engines
    # must produce identical doubles after the query's own rounding)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    records = {}
    def rec(name, rows_match, schema_match, hash_match, sr, orr, err=None):
        records[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        got = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            rec(name, False, False, False, len(got), 0, f"oracle SQL failed: {e}"[:200])
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: columns differ spark={list(g.columns)} duck={list(e.columns)}")
            rec(name, len(g) == len(e), False, False, len(g), len(e))
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: row counts differ spark={len(g)} duck={len(e)}")
            rec(name, False, True, False, len(g), len(e))
            n_fail += 1
            continue
        # Driver hashes value REPRESENTATIONS, so int64 60 vs float64 60.0
        # is a hash fail even when values are numerically equal. Mirror
        # that: dtype KIND must agree post-normalization (i/u=integral,
        # f=float, O=object, b=bool, M=datetime).
        kind = lambda d: {"u": "i"}.get(d.kind, d.kind)
        drift = [c for c in g.columns if kind(g[c].dtype) != kind(e[c].dtype)]
        if drift:
            print(f"✗ {name}: dtype drift (driver hash would differ): "
                  + ", ".join(f"{c} spark={g[c].dtype} duck={e[c].dtype}" for c in drift))
            rec(name, True, True, False, len(g), len(e),
                "dtype drift: " + ",".join(drift))
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(g)} rows")
            rec(name, True, True, True, len(g), len(e))
            n_pass += 1
        except AssertionError as ex:
            print(f"✗ {name}: value mismatch:\n{str(ex)[:600]}")
            # show first differing rows
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark:", g.loc[i].to_dict())
                print("  duck :", e.loc[i].to_dict())
            rec(name, True, True, False, len(g), len(e), "value mismatch")
            n_fail += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
