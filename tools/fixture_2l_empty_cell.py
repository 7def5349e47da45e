#!/usr/bin/env python3
"""Trained-empty coarse cell gate fixture for the two-level k-means
frozen-codebook contract (cluster_assign_incremental_2l).

The hazard: a coarse cell the TRAINING subset never reaches keeps a
stale centroid (empty clusters carry their previous centroid), and an
INCREMENT vector can strictly argmin to that stale centroid. The cell
has no fine centroids, so the engine's fine kernel would null and the
oracle's `w JOIN f ON cell` would silently drop the row — a latent
engine/oracle divergence the standard synthetic corpora never trip.

Contract (mirrored on both sides this round): the final assignment's
coarse argmin considers only NON-EMPTY cells — every vector lands in
the nearest cell that actually has a codebook, one row per input.

This script is the proof: it
  1. synthesizes a crafted `embeddings` corpus where coarse cell 0 is
     trained-empty (stale centroid 21.5) and increment vec_id=7 at
     18.0 strictly argmins to it (dist 3.5^2 < 3.6667^2 to cell 1),
  2. simulates the full two-level pipeline in pure Python (quantize ->
     coarse Lloyd on evens -> non-empty-restricted assignment -> fine
     seeds/rounds -> final fine assignment) to get the expected rows,
  3. runs the engine (graft.Verify, query cluster_assign_incremental_2l)
     on the fixture dir,
  4. runs the generated DuckDB oracle SQL on the same fixture,
  5. asserts engine == oracle == simulation, one row per input vector.

Usage: python3 tools/fixture_2l_empty_cell.py [--skip-engine]
  --skip-engine: only check oracle SQL vs simulation (no sbt run).
Exits non-zero on any mismatch.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KC, KF, ROUNDS, DIM, QS = 4, 4, 3, 64, 10000

# Training evens (ids 0..14): seeds are the 4 lowest ids -> 26, 5, 0, 30.
# Lloyd leaves cell 0 empty in the FINAL assignment (stale centroid
# 215000 = 21.5); increments are the odds, vec_id=7 at 18.0 is the
# empty-cell hitter.
TRAIN = [(0, 26), (2, 5), (4, 0), (6, 30), (8, 12), (10, 27), (12, 14), (14, 17)]
INCR = [(1, 4), (3, 13), (5, 29), (7, 18)]
ROWS = sorted(TRAIN + INCR)


def vec(v):
    return [float(v)] + [0.0] * (DIM - 1)


def q1(v):  # quantized first component; all other dims quantize to 0
    return v * QS


def argmin(x, cents, allowed):
    return min(allowed, key=lambda j: ((x - cents[j]) ** 2, j))


def tdiv(a, b):
    """Truncate-toward-zero integer division — the engine's `div` and
    DuckDB's `//` semantics; Python's // floors, which diverges on
    negative sums (the fixture is nonnegative today, but the reference
    simulation must not silently disagree if it ever is not)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def simulate():
    """Pure-python twin of the frozen two-level codebook pipeline."""
    train = {i: q1(v) for i, v in TRAIN}
    allv = {i: q1(v) for i, v in ROWS}
    # coarse Lloyd on training, seeds = KC lowest ids
    cents = [train[i] for i in sorted(train)[:KC]]
    for _ in range(ROUNDS):
        groups = {}
        for i, x in train.items():
            groups.setdefault(argmin(x, cents, range(KC)), []).append(x)
        cents = [tdiv(sum(g), len(g)) if (g := groups.get(c)) else cents[c]
                 for c in range(KC)]
    # training rows' final cells define non-emptiness and fine seeds
    tcell = {i: argmin(x, cents, range(KC)) for i, x in train.items()}
    nonempty = sorted(set(tcell.values()))
    assert 0 not in nonempty, "fixture must leave coarse cell 0 trained-empty"
    # fine seeds: KF lowest-id training rows per cell
    fine = {c: [] for c in nonempty}
    for i in sorted(train):
        c = tcell[i]
        if len(fine[c]) < KF:
            fine[c].append(train[i])
    # fine Lloyd rounds over training rows (cell fixed per row)
    for _ in range(ROUNDS):
        groups = {}
        for i, x in train.items():
            c = tcell[i]
            f = argmin(x, fine[c], range(len(fine[c])))
            groups.setdefault((c, f), []).append(x)
        for (c, f), g in groups.items():
            fine[c][f] = tdiv(sum(g), len(g))
    # final assignment: ALL rows, coarse restricted to non-empty cells
    out = {}
    for i, x in allv.items():
        c = argmin(x, cents, nonempty)
        f = argmin(x, fine[c], range(len(fine[c])))
        out[i] = (c, f, c * KF + f, (x - fine[c][f]) ** 2, i % 2 != 0)
    hit = argmin(allv[7], cents, range(KC))
    assert hit == 0, f"vec 7 must globally argmin to the empty cell, got {hit}"
    return out, cents, nonempty


def write_fixture(d):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    for i, v in ROWS:
        con.execute("INSERT INTO t VALUES (?, ?, ?)", [i, vec(v), 0])
    con.execute(
        f"COPY (SELECT * FROM t ORDER BY vec_id) TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


def fetch(con, sql):
    rows = con.execute(sql).fetchall()
    return sorted((int(r[0]), int(r[1]), int(r[2]), int(r[3]), int(r[4]), bool(r[5]))
                  for r in rows)


def main():
    skip_engine = "--skip-engine" in sys.argv
    sim, cents, nonempty = simulate()
    expect = sorted((i, c, f, cl, d, n) for i, (c, f, cl, d, n) in sim.items())
    work = tempfile.mkdtemp(prefix="fix2l_")
    try:
        fdir = os.path.join(work, "sf")
        out = os.path.join(work, "out")
        os.makedirs(fdir)
        write_fixture(fdir)
        print(f"[fixture] coarse centroids {cents}, non-empty cells {nonempty}")
        print(f"[fixture] vec 7 (18.0) hits trained-empty cell 0 "
              f"-> contract reroutes to cell {sim[7][0]}")

        # oracle SQL: generated by the Scala builders; dumped by Verify.
        # Without the engine run, fall back to a previously dumped copy.
        if not skip_engine:
            r = subprocess.run(
                ["sbt", "-batch",
                 f"runMain graft.Verify {fdir} {out} cluster_assign_incremental_2l"],
                cwd=REPO, capture_output=True, text=True, timeout=900)
            if r.returncode != 0:
                print(r.stdout[-3000:], r.stderr[-3000:])
                sys.exit(f"engine run failed rc={r.returncode}")
            oracle_sql = json.load(open(os.path.join(out, "oracle_sql.json")))[
                "cluster_assign_incremental_2l"]
        else:
            dumped = os.path.join(REPO, "verify_out", "oracle_sql.json")
            oracle_sql = json.load(open(dumped))["cluster_assign_incremental_2l"]

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{fdir}/embeddings.parquet' "
            "WHERE embedding IS NOT NULL AND len(embedding) = 64")
        got_oracle = fetch(
            con, f"SELECT vec_id, cell, fine, cluster, qdist, is_new FROM ({oracle_sql})")
        assert got_oracle == expect, (
            f"ORACLE != SIM\noracle: {got_oracle}\nsim:    {expect}")
        print(f"[fixture] oracle == simulation ({len(expect)} rows, "
              "one per input vector, no drops)")

        if not skip_engine:
            got_engine = fetch(
                con, "SELECT vec_id, cell, fine, cluster, qdist, is_new FROM "
                     f"'{out}/cluster_assign_incremental_2l/*.parquet'")
            assert got_engine == expect, (
                f"ENGINE != SIM\nengine: {got_engine}\nsim:    {expect}")
            print(f"[fixture] engine == oracle == simulation: PASS")
        con.close()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
