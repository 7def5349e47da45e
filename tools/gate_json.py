#!/usr/bin/env python3
"""Convert a tools/check.py gate log into the driver-format correctness
JSON ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}), so records like CORRECTNESS_sf1.json are
reproducible from the committed run log instead of hand-assembled.

Usage: python3 tools/gate_json.py <check_log> <out_json>

PASS lines carry the row count; FAIL lines carry the reason. The
row/schema/hash split mirrors what the FAIL reason names (a rows
mismatch fails rows_match, a column mismatch fails schema_match,
everything else fails hash_match with the reason in err).
"""
import json, re, sys

log, out = sys.argv[1], sys.argv[2]
res = {}
for line in open(log):
    m = re.match(r"PASS (\S+) \((\d+) rows(?:, multiset-hash)?\)", line.strip())
    if m:
        res[m.group(1)] = {"rows_match": True, "schema_match": True,
                           "hash_match": True,
                           "spark_rows": int(m.group(2)),
                           "oracle_rows": int(m.group(2)), "err": None}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line.strip())
    if m:
        name, why = m.group(1), m.group(2)
        rows = re.match(r"rows spark=(\d+) oracle=(\d+)", why)
        entry = {"rows_match": rows is None, "schema_match": True,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": why}
        if rows:
            entry["spark_rows"] = int(rows.group(1))
            entry["oracle_rows"] = int(rows.group(2))
        if why.startswith("columns "):
            entry["schema_match"] = False
        res[name] = entry

json.dump(res, open(out, "w"), indent=0, sort_keys=True)
ok = sum(1 for v in res.values() if v["hash_match"])
print(f"{out}: {len(res)} queries, {ok} fully green")
