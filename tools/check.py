#!/usr/bin/env python3
"""Local emulator of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir] [--skip-verify] [names...]

1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless --skip-verify).
2. For each entry in <out_dir>/oracle_sql.json, runs the SQL in DuckDB with
   views over the same parquet tables, reads the Spark parquet result, sorts
   columns by name and rows by all columns, and compares cell-by-cell
   (floats exact after both sides' round(); reports max abs diff on mismatch).
"""
import duckdb, json, math, subprocess, sys, glob, os

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = [a for a in sys.argv[1:] if a.startswith("--")]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
only = set(args[2:])

if "--skip-verify" not in flags:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit("sbt runMain Verify failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)

con = duckdb.connect()
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
fails = []
for name, sql in sorted(oracle_sql.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; fails.append(name); continue

    # Results too big for a pandas sort-and-diff (j5 at the 10x synth
    # scale is 112M rows) compare entirely in DuckDB: sorted column
    # names must match, then count(*) + an order-free sum of per-row
    # hashes over VARCHAR-canonicalized cells — exact multiset
    # equality up to hash collisions, no materialized sort anywhere.
    # Float columns round to 8 decimals before hashing so the small
    # path's 1e-9 ulp tolerance has an analogue (a diff straddling an
    # exact 1e-8 grid line could still flip the hash — today's >2M-row
    # results are integer/string-only, and every float oracle already
    # emits round(x, 4) on both sides by convention).
    try:
        n_probe = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
    if n_probe > 2_000_000:
        try:
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchdf()
            scols = sorted(sdesc["column_name"])
            stypes = dict(zip(sdesc["column_name"], sdesc["column_type"]))
            ocols = sorted(con.execute(
                f"DESCRIBE {sql}").fetchdf()["column_name"])
            if scols != ocols:
                print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
                n_fail += 1; fails.append(name); continue

            def cell(c):
                if stypes.get(c) in ("FLOAT", "DOUBLE"):
                    return f'coalesce(CAST(round(CAST("{c}" AS DOUBLE), 8)' \
                           f" AS VARCHAR), '\\x00null')"
                return f'coalesce(CAST("{c}" AS VARCHAR), \'\\x00null\')'
            keys = ", ".join(cell(c) for c in scols)
            agg = f"SELECT count(*) AS n, sum(hash({keys})::HUGEINT) AS hs"
            sn, sh = con.execute(
                f"{agg} FROM read_parquet({files!r})").fetchone()
            on, oh = con.execute(f"{agg} FROM ({sql})").fetchone()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue
        if sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}")
            n_fail += 1; fails.append(name)
        elif sh != oh:
            print(f"FAIL {name}: multiset hash mismatch over {sn} rows")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({sn} rows, multiset-hash)"); n_pass += 1
        continue

    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; fails.append(name); continue

    sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
    if sc != oc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}")
        n_fail += 1; fails.append(name); continue
    # dtype parity (the driver may hash schemas too): int32 vs int64 etc.
    dtw = [(c, str(spark_df[c].dtype), str(oracle_df[c].dtype)) for c in sc
           if str(spark_df[c].dtype) != str(oracle_df[c].dtype)]
    if dtw:
        print(f"WARN {name}: dtype mismatch {dtw}")
    s = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
    o = oracle_df[oc].sort_values(oc, kind="mergesort").reset_index(drop=True)
    if len(s) != len(o):
        print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
        n_fail += 1; fails.append(name); continue
    ok = True; max_diff = 0.0; bad_col = None; nbad = 0
    for c in sc:
        sv, ov = s[c], o[c]
        try:
            import pandas as pd
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                diff = (sv.astype(float) - ov.astype(float)).abs()
                diff = diff.fillna((sv.isna() != ov.isna()).astype(float))
                m = float(diff.max()) if len(diff) else 0.0
                if m > 1e-9:
                    ok = False; nbad += int((diff > 1e-9).sum())
                    if m > max_diff: max_diff, bad_col = m, c
            else:
                neq = (sv.astype(str) != ov.astype(str))
                if neq.any():
                    ok = False; nbad += int(neq.sum()); bad_col = bad_col or c
        except Exception as e:
            ok = False; bad_col = c; print(f"  cmp error {name}.{c}: {e}")
    if ok:
        print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    else:
        print(f"FAIL {name}: col={bad_col} bad_cells={nbad} max_float_diff={max_diff}")
        # show first mismatching rows
        for c in sc:
            if (s[c].astype(str) != o[c].astype(str)).any():
                idx = (s[c].astype(str) != o[c].astype(str)).idxmax()
                print(f"   {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
                break
        n_fail += 1; fails.append(name)

print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
sys.exit(1 if n_fail else 0)
