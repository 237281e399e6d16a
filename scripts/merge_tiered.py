#!/usr/bin/env python3
"""Merge per-shard check_tiered.py outputs into one record.

Usage: merge_tiered.py <out.json> <shard1.json> [shard2.json ...]
"""
import sys, json

def main():
    out, shards = sys.argv[1], sys.argv[2:]
    docs = [json.load(open(p)) for p in shards]
    merged = dict(docs[0])
    merged["queries"] = {}
    counts = {}
    for d in docs:
        merged["queries"].update(d["queries"])
        for k, v in d["counts"].items():
            counts[k] = counts.get(k, 0) + v
    merged["counts"] = counts
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"merged {len(merged['queries'])} queries: {counts}")
    ok = counts.get("mismatch", 0) == 0 and counts.get("missing", 0) == 0
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
