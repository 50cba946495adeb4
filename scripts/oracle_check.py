#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first,
then this script compares each query's parquet output against the DuckDB
oracle (sort columns by name, compare row-by-row).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm(x) for x in v)
    if isinstance(v, np.generic):
        return norm(v.item())
    return v

def stale_warning(out_dir, name):
    """Warn when a query dump predates the newest Verify run's _manifest.json
    (a leftover from an older HEAD in a reused out-dir — oracle_check would
    otherwise happily 'check' it). After a FILTERED Verify run the manifest
    records the filter; queries outside it are legitimately older than the
    manifest, so the warning is scoped to the names the run re-dumped."""
    import os
    manifest = os.path.join(out_dir, "_manifest.json")
    if not os.path.exists(manifest):
        return None
    try:
        run_filter = json.load(open(manifest)).get("filter")
    except (OSError, ValueError):
        run_filter = None
    if run_filter is not None and name not in run_filter:
        return None
    qdir = os.path.join(out_dir, name)
    try:
        newest = max(os.path.getmtime(os.path.join(qdir, f))
                     for f in os.listdir(qdir)
                     if f.endswith(".parquet") and not f.startswith("."))
    # OSError covers FileNotFoundError AND NotADirectoryError (a dump
    # that is a single parquet file rather than a directory)
    except (OSError, ValueError):
        return None
    if newest < os.path.getmtime(manifest):
        return (f"WARN {name}: dump is OLDER than the newest Verify run "
                f"(_manifest.json) — stale leftover from a previous HEAD?")
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        w = stale_warning(out_dir, name)
        if w:
            print(w)
        try:
            exp = con.execute(sql).fetch_df()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            status = []
            if list(exp.columns) != list(got.columns):
                status.append(f"cols: oracle={list(exp.columns)} got={list(got.columns)}")
            if len(exp) != len(got):
                status.append(f"rows: oracle={len(exp)} got={len(got)}")
            if not status:
                erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
                grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
                diff = [(i, a, b) for i, (a, b) in enumerate(zip(erows, grows)) if a != b]
                if diff:
                    i, a, b = diff[0]
                    status.append(f"{len(diff)} row diffs; first at {i}:\n  oracle: {a}\n  got:    {b}")
            if status:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(status))
            else:
                n_pass += 1
                print(f"PASS {name} ({len(got)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
