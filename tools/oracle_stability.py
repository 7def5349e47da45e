#!/usr/bin/env python3
"""Oracle determinism scanner.

DuckDB 1.0's parallel window operator mis-partitions NULL partition
keys (multiple rn=1 rows per null partition, varying run to run), and
its IGNORE NULLS path is similarly unstable — so an oracle can be
VALUE-CORRECT yet flap under the multi-threaded compare. This tool
runs every oracle N times against a corpus (default: the seeded fuzz
corpus, whose null-rich columns are what trigger the bug) and reports
any query whose result set differs between runs.

Usage: python3 tools/oracle_stability.py [sf_dir] [oracle_sql.json] [N]

Run it after adding any oracle that windows over a possibly-null
partition key. Expected output: `all stable`.
"""
import duckdb, json, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dirty_gates/fuzz"
sql_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r12_ff_new/oracle_sql.json"
n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle_sql = json.load(open(sql_path))
unstable, errored = [], []
for name, sql in sorted(oracle_sql.items()):
    ref = None
    try:
        for i in range(n_runs):
            df = con.execute(sql).fetchdf()
            cols = sorted(df.columns)
            df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
            sig = hash(tuple(map(tuple, df.itertuples(index=False))))
            if ref is None:
                ref = sig
            elif sig != ref:
                unstable.append(name)
                print(f"UNSTABLE {name} (run {i} differs)")
                break
    except Exception as e:
        errored.append(name)
        print(f"ERROR {name}: {str(e)[:120]}")

if not unstable and not errored:
    print(f"all stable ({len(oracle_sql)} oracles x {n_runs} runs)")
sys.exit(1 if (unstable or errored) else 0)
