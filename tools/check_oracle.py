#!/usr/bin/env python3
"""Replays oracle_sql.json in DuckDB against the same parquet tables and
compares with the Spark-written parquet outputs (the driver's gate, locally)."""
import duckdb, json, sys, glob, os, threading

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
# per-oracle wall budget (seconds); 0 = unlimited. For big scale factors some
# oracles (e.g. the full minhash replication) are intractable in single-node
# DuckDB - they report as [oracle-timeout], distinct from failures.
timeout_s = float(os.environ.get("ORACLE_TIMEOUT", "0"))

con = duckdb.connect()
# ORACLE_THREADS caps DuckDB's parallelism so a replay can run beside a
# timing sweep without polluting it (default: all cores)
if os.environ.get("ORACLE_THREADS"):
    con.execute(f"SET threads = {int(os.environ['ORACLE_THREADS'])}")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p  # Spark writes parquet DIRS
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
written = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
# a gate whose Spark run produced no output is a FAILURE, not a skip —
# otherwise an analysis-time error (e.g. duplicate observe names) passes
# silently as "everything listed matched"
for name in sorted(set(oracles) - written):
    print(f"✗ {name}: no Spark output written (query failed?)")
    fail += 1
for name in sorted(written):
    d = os.path.join(out_dir, name)
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    timer = None
    timed_out = []
    # done flag guards the race where the timer fires after fetchdf() returns
    # but before cancel(): a late interrupt() would abort the NEXT oracle on
    # the shared connection and count it as a real failure
    done = threading.Event()
    if timeout_s > 0:
        def _interrupt():
            if not done.is_set():
                timed_out.append(1)
                con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
    try:
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        if timed_out:
            print(f"  [oracle-timeout] {name}: DuckDB exceeded {timeout_s:.0f}s (spark output present, {len(spark_df)} rows)")
        else:
            print(f"✗ {name}: oracle SQL failed: {e}")
            fail += 1
        continue
    finally:
        done.set()
        if timer: timer.cancel()
    s = spark_df[sorted(spark_df.columns)].astype(str).sort_values(by=sorted(spark_df.columns)).reset_index(drop=True)
    o = oracle_df[sorted(oracle_df.columns)].astype(str).sort_values(by=sorted(oracle_df.columns)).reset_index(drop=True)
    if list(s.columns) != list(o.columns):
        print(f"✗ {name}: column mismatch {list(s.columns)} vs {list(o.columns)}")
        fail += 1
    elif len(s) != len(o):
        print(f"✗ {name}: row count {len(s)} vs {len(o)}")
        fail += 1
    elif not s.equals(o):
        diff = (s != o).any(axis=1)
        print(f"✗ {name}: {diff.sum()} differing rows, first:")
        print("  spark :", s[diff].head(2).to_dict('records'))
        print("  oracle:", o[diff].head(2).to_dict('records'))
        fail += 1
    else:
        print(f"✓ {name}: {len(s)} rows match")
        ok += 1
print(f"\n{ok} matched, {fail} failed")
sys.exit(1 if fail else 0)
