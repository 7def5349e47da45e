#!/usr/bin/env python3
"""100x-representative scale gate (verdict r15 item 2).

Runs each SCALE-SENSITIVE query (the families whose cost shape changes
with the corpus: self-join pairs, dedup, graph, IVF ANN, semantic
dedup) against a 100x synth corpus (tools/synth_scale.py with K=100),
one JVM per query so peak memory is attributable, then compares each
result against the DuckDB oracle via tools/check.py --skip-verify.

Usage: python3 tools/sf10_gate.py [sf10_dir] [out_dir] [names...]

Writes CORRECTNESS_sf10_subset.json in the driver's correctness format
plus per-query `wall_sec` / `peak_rss_mb` fields (the "peak-memory
notes per query" the scale record asks for). A query whose ORACLE side
is infeasible at this tier (DuckDB runtime past the per-query timeout)
is recorded with err="oracle timeout at sf10" and rows-only status, not
silently dropped.

Run `sbt compile` (or a test run) first: the JVM is launched straight
off target/scala-2.13/classes + /opt/spark/jars so 28 queries don't pay
28 sbt startups.
"""
import glob, json, os, re, subprocess, sys, time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_synth"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf10"
# j5_self_join_pairs is DELIBERATELY absent from the 100x default list
# and gated at a 30x tier instead (run explicitly with a K=30 corpus):
# its RESULT is quadratic in corpus scale (~112M pair rows at 10x ->
# ~10^10 at 100x, past this box's disk) — a property of the query's
# answer, not of the plan, which stays the same hash-partitioned
# equi-join at every tier. Recording the drop here so the cap is never
# silent.
names = sys.argv[3:] or [
    "dedup_exact", "dedup_prefix", "dedup_minhash", "dedup_simhash",
    "dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_segments",
    "dedup_incremental", "dedup_pipeline", "dedup_canonical_quality",
    "dedup_embedding_cosine", "dedup_semantic", "dedup_semantic_2l",
    "graph_components", "graph_triangles", "graph_kcore",
    "graph_labelprop", "graph_link_prediction", "graph_modularity",
    "graph_pagerank", "graph_ppr", "graph_bfs_distances",
    "graph_random_walks",
    "ann_ivf_topk", "ann_ivf_bucketed", "ann_ivfpq_topk", "ann_ivfpq_rerank",
]

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def classpath():
    classes = "/root/repo/target/scala-2.13/classes"
    if not os.path.isdir(classes):
        sys.exit("run sbt compile first: missing " + classes)
    jars = sorted(glob.glob("/opt/spark/jars/*.jar"))
    # scala-library rides the spark jars dir; scalatest not needed
    return ":".join([classes] + jars)


def run_one(name, cp):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Xmx96g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.Verify", sf_dir, out_dir, name,
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_VERIFY_THREADS="1")
    t0 = time.time()
    # peak RSS via /proc VmHWM polling (no GNU time in the container):
    # HWM is monotone, so the last successful read before exit is the
    # JVM's true high-water mark to within the poll interval
    with open("/tmp/sf10_engine.log", "w") as log:
        p = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                             env=env, cwd="/root/repo", text=True)
        hwm_kb = 0
        deadline = t0 + 3600
        while p.poll() is None:
            try:
                with open(f"/proc/{p.pid}/status") as st:
                    m = re.search(r"VmHWM:\s+(\d+) kB", st.read())
                    if m:
                        hwm_kb = max(hwm_kb, int(m.group(1)))
            except OSError:
                pass
            if time.time() > deadline:
                p.kill()
                print(f"  ENGINE TIMEOUT {name} (3600s)")
                return time.time() - t0, hwm_kb // 1024, False
            time.sleep(0.5)
    wall = time.time() - t0
    stderr = open("/tmp/sf10_engine.log").read()
    failed = ("[verify] %s failed" % name) in stderr or p.returncode != 0
    if failed:
        tail = [l for l in stderr.splitlines() if "failed" in l or "Error" in l][-3:]
        print(f"  ENGINE FAIL {name}: {tail}")
    return wall, hwm_kb // 1024, not failed


def main():
    cp = classpath()
    os.makedirs(out_dir, exist_ok=True)
    stats = {}
    for name in names:
        print(f"[sf10] engine: {name}", flush=True)
        wall, rss_mb, ok = run_one(name, cp)
        stats[name] = {"wall_sec": round(wall, 1), "peak_rss_mb": rss_mb,
                       "engine_ok": ok}
        print(f"  {wall:.1f}s, peak {rss_mb} MB, ok={ok}", flush=True)

    # oracle compare, one query per check.py call so a timeout is
    # attributable (and recorded) instead of sinking the whole gate
    results = {}
    for name in names:
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        entry.update(stats[name])
        if not stats[name]["engine_ok"]:
            entry["err"] = "engine failed at sf10"
            results[name] = entry
            continue
        print(f"[sf10] oracle: {name}", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "tools/check.py", sf_dir, out_dir,
                 "--skip-verify", name],
                capture_output=True, text=True, cwd="/root/repo", timeout=3600)
            out = r.stdout
            pm = re.search(rf"PASS {name} \((\d+) rows(?:, multiset-hash)?\)", out)
            fm = re.search(rf"FAIL {name}: (.*)", out)
            if pm:
                n = int(pm.group(1))
                entry.update(rows_match=True, schema_match=True,
                             hash_match=True, spark_rows=n, oracle_rows=n)
            elif fm:
                why = fm.group(1)
                rows = re.match(r"rows spark=(\d+) oracle=(\d+)", why)
                entry.update(err=why, rows_match=rows is None, schema_match=True)
                if rows:
                    entry.update(spark_rows=int(rows.group(1)),
                                 oracle_rows=int(rows.group(2)))
                if why.startswith("columns "):
                    entry["schema_match"] = False
            else:
                entry["err"] = ("no PASS/FAIL line: " +
                                (out.strip().splitlines() or ["<empty>"])[-1])[:300]
            print("  " + (("PASS" if entry["hash_match"] else
                           f"FAIL: {entry['err']}")), flush=True)
        except subprocess.TimeoutExpired:
            # the ENGINE result exists; only the oracle replay is
            # infeasible at this tier — record honestly as rows-only
            fs = glob.glob(f"{out_dir}/{name}/*.parquet")
            entry.update(err="oracle timeout at sf10 (engine result recorded)",
                         rows_match=bool(fs), schema_match=True)
            print("  ORACLE TIMEOUT", flush=True)
        results[name] = entry

    for v in results.values():
        v["sf_dir"] = sf_dir
    out_json = os.environ.get("SF10_GATE_JSON",
                              "/root/repo/CORRECTNESS_sf10_subset.json")
    # MERGE over an existing record so the j5-at-30x tier run and the
    # 100x sweep land in one file (each entry carries its sf_dir)
    prev = {}
    if os.path.exists(out_json):
        try:
            prev = json.load(open(out_json))
        except Exception:
            prev = {}
    prev.update(results)
    json.dump(prev, open(out_json, "w"), indent=0, sort_keys=True)
    ok = sum(1 for v in prev.values() if v["hash_match"])
    print(f"{out_json}: {len(prev)} queries, {ok} fully green")


if __name__ == "__main__":
    main()
