#!/usr/bin/env python3
"""Local emulator of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir] [--skip-verify] [--mutate] [names...]

1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless --skip-verify).
2. For each entry in <out_dir>/oracle_sql.json, runs the SQL in DuckDB with
   views over the same parquet tables, reads the Spark parquet result, sorts
   columns by name and rows by all columns, and compares cell-by-cell
   (floats exact after both sides' round(); reports max abs diff on mismatch).

--mutate (mutation-tests the gate itself; implies --skip-verify semantics
for the compare inputs — reuse an out_dir a real run already filled):
for every query, plant output-changing faults into the ORACLE side and
assert the comparator goes RED for each. A surviving mutant is a gate
blind spot and fails the run. Two universal mutants per query:
  drop-row  — `SELECT * FROM (sql) OFFSET 1` (skipped when the true
              result is empty: dropping from nothing changes nothing)
  perturb   — first numeric column +1 / first string column || '_x'
              on every row (skipped when no mutable column or 0 rows)
"""
import duckdb, json, math, subprocess, sys, glob, os

args = [a for a in sys.argv[1:] if not a.startswith("--")]
flags = [a for a in sys.argv[1:] if a.startswith("--")]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
only = set(args[2:])
MUTATE = "--mutate" in flags

if "--skip-verify" not in flags and not MUTATE:
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

FLOATY = ("FLOAT", "DOUBLE", "REAL")
# largest prime < 2^63: folds the 64-bit row hash before squaring so the
# quadratic term stays inside HUGEINT across 10^8-row sums
P63 = 9223372036854775783


def compare_one(name, files, sql, force_big=False):
    """Compare spark parquet files against oracle SQL.

    Returns (ok, msg). THE comparator — the main gate and the mutation
    harness both call exactly this, so a mutation kill certifies the
    same code path the real gate trusts. force_big routes the compare
    through the >2M-row multiset-hash path regardless of size — the
    mutation harness uses it so the big path (where j5's 112M-row sf1
    result lives) has its own kill record, not just the pandas path.
    """
    try:
        n_probe = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    except Exception as e:
        return False, f"{e}"

    # Results too big for a pandas sort-and-diff (j5 at the 10x synth
    # scale is 112M rows) compare entirely in DuckDB: sorted column
    # names must match, then count(*) + two order-free hash sums over
    # VARCHAR-canonicalized cells — sum(h) and sum(((h%P)^2)%P), so a
    # multiset collision must fool two independent symmetric functions
    # at once. The canonical type per column comes from BOTH describes:
    # if EITHER side is floating, both cast to DOUBLE and round to 8
    # decimals before hashing (an int-vs-float dtype divergence the
    # small path merely WARNs about would otherwise render '1' vs
    # '1.0' and hard-fail the hash).
    if n_probe > 2_000_000 or force_big:
        try:
            sdesc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchdf()
            scols = sorted(sdesc["column_name"])
            stypes = dict(zip(sdesc["column_name"], sdesc["column_type"]))
            odesc = con.execute(f"DESCRIBE {sql}").fetchdf()
            ocols = sorted(odesc["column_name"])
            otypes = dict(zip(odesc["column_name"], odesc["column_type"]))
            if scols != ocols:
                return False, f"columns spark={scols} oracle={ocols}"

            def cell(c):
                if stypes.get(c, "") in FLOATY or otypes.get(c, "") in FLOATY:
                    return f'coalesce(CAST(round(CAST("{c}" AS DOUBLE), 8)' \
                           f" AS VARCHAR), '\\x00null')"
                return f'coalesce(CAST("{c}" AS VARCHAR), \'\\x00null\')'
            keys = ", ".join(cell(c) for c in scols)
            agg = (f"SELECT count(*) AS n, sum(__h) AS hs, "
                   f"sum(((__h % {P63}) * (__h % {P63})) % {P63}) AS hq "
                   f"FROM (SELECT hash({keys})::HUGEINT AS __h FROM ")
            sn, sh, sq = con.execute(
                f"{agg} read_parquet({files!r}))").fetchone()
            on, oh, oq = con.execute(f"{agg} ({sql}))").fetchone()
        except Exception as e:
            return False, f"{e}"
        if sn != on:
            return False, f"rows spark={sn} oracle={on}"
        if sh != oh or sq != oq:
            return False, f"multiset hash mismatch over {sn} rows"
        return True, f"({sn} rows, multiset-hash)"

    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        return False, f"{e}"

    sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
    if sc != oc:
        return False, f"columns spark={sc} oracle={oc}"
    # dtype parity (the driver may hash schemas too): int32 vs int64 etc.
    dtw = [(c, str(spark_df[c].dtype), str(oracle_df[c].dtype)) for c in sc
           if str(spark_df[c].dtype) != str(oracle_df[c].dtype)]
    if dtw:
        print(f"WARN {name}: dtype mismatch {dtw}")
    s = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
    o = oracle_df[oc].sort_values(oc, kind="mergesort").reset_index(drop=True)
    if len(s) != len(o):
        return False, f"rows spark={len(s)} oracle={len(o)}"
    ok = True; max_diff = 0.0; bad_col = None; nbad = 0
    for c in sc:
        sv, ov = s[c], o[c]
        try:
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                diff = (sv.astype(float) - ov.astype(float)).abs()
                diff = diff.fillna((sv.isna() != ov.isna()).astype(float))
                m = float(diff.max()) if len(diff) else 0.0
                if m > 1e-9:
                    ok = False; nbad += int((diff > 1e-9).sum())
                    if m > max_diff: max_diff, bad_col = m, c
            else:
                neq = (sv.astype(str) != o[c].astype(str))
                if neq.any():
                    ok = False; nbad += int(neq.sum()); bad_col = bad_col or c
        except Exception as e:
            ok = False; bad_col = c; print(f"  cmp error {name}.{c}: {e}")
    if ok:
        return True, f"({len(s)} rows)"
    detail = ""
    for c in sc:
        if (s[c].astype(str) != o[c].astype(str)).any():
            idx = (s[c].astype(str) != o[c].astype(str)).idxmax()
            detail = f"\n   {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}"
            break
    return False, (f"col={bad_col} bad_cells={nbad} "
                   f"max_float_diff={max_diff}{detail}")


def mutants(name, files, sql):
    """Yield (label, mutated_sql) faults that MUST change the result
    multiset, or explain the skip with (label, None)."""
    n = con.execute(
        f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
    if n == 0:
        yield "drop-row", None
        yield "perturb", None
        return
    yield "drop-row", f"SELECT * FROM ({sql}) __mut OFFSET 1"
    desc = con.execute(f"DESCRIBE {sql}").fetchdf()
    expr = None
    for cn, ct in zip(desc["column_name"], desc["column_type"]):
        base = ct.split("(")[0]
        if base in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
                    "FLOAT", "DOUBLE", "REAL", "DECIMAL"):
            # coalesce: an all-NULL column would absorb a bare +1
            expr = f'(coalesce("{cn}", 0) + 1) AS "{cn}"'; break
        if base in ("VARCHAR",):
            expr = f'(coalesce("{cn}", \'\') || \'_x\') AS "{cn}"'; break
        if base in ("BOOLEAN",):
            expr = f'(NOT coalesce("{cn}", false)) AS "{cn}"'; break
    yield "perturb", (
        f"SELECT * REPLACE ({expr}) FROM ({sql}) __mut" if expr else None)


oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
fails = []

# The hash path only triggers past 2M rows, which no gate-tier result
# reaches — so the mutation run additionally forces the LARGEST results
# through it (>=3), giving the big-path comparator its own kill record.
BIG_FORCED = set()
if MUTATE:
    sizes = []
    for name in oracle_sql:
        if only and name not in only:
            continue
        fs = glob.glob(f"{out_dir}/{name}/*.parquet")
        if fs:
            try:
                sizes.append((con.execute(
                    f"SELECT count(*) FROM read_parquet({fs!r})").fetchone()[0],
                    name))
            except Exception:
                pass
    # a result already past the 2M-row threshold routes through the
    # multiset-hash branch on its NORMAL pass — forcing it again would
    # duplicate identical baseline+mutant runs and double-count kills
    BIG_FORCED = {n for c, n in sorted(sizes, reverse=True)[:3] if c <= 2_000_000}
    if BIG_FORCED:
        print(f"[mutate] forcing multiset-hash path for {sorted(BIG_FORCED)}")

for name, sql in sorted(oracle_sql.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; fails.append(name); continue

    if MUTATE:
        paths = [(False, "")] + ([(True, "/big-path")] if name in BIG_FORCED else [])
        for force_big, tag in paths:
            # the unmutated oracle must pass first, or a kill proves nothing
            ok, msg = compare_one(name, files, sql, force_big=force_big)
            if not ok:
                print(f"FAIL {name}{tag}: baseline compare red before mutation: {msg}")
                n_fail += 1; fails.append(name + tag)
                break  # one red baseline fails the query once, not per path
            for label, msql in mutants(name, files, sql):
                if msql is None:
                    print(f"SKIP {name}/{label}{tag}: no applicable mutation")
                    continue
                mok, _ = compare_one(name, files, msql, force_big=force_big)
                if mok:
                    print(f"FAIL {name}/{label}{tag}: MUTANT SURVIVED — gate blind spot")
                    n_fail += 1; fails.append(f"{name}/{label}{tag}")
                else:
                    print(f"KILL {name}/{label}{tag}"); n_pass += 1
        continue

    ok, msg = compare_one(name, files, sql)
    if ok:
        print(f"PASS {name} {msg}"); n_pass += 1
    else:
        print(f"FAIL {name}: {msg}"); n_fail += 1; fails.append(name)

word = "killed" if MUTATE else "pass"
print(f"\n{n_pass} {word}, {n_fail} fail" + (f": {fails}" if fails else ""))
sys.exit(1 if n_fail else 0)
