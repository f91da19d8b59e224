#!/usr/bin/env python3
"""Combine an armed and a clean `graft.Faults` output line into the
round's FAULTS artifact: parse the one-line JSON each process printed,
diff the per-query and per-append hashes, and emit the comparison JSON
(the FAULTS_r{N}.json shape). Usage:

    python3 tools/faults_compare.py <armed.out> <clean.out> > FAULTS_rNN.json

Exit code 1 if any hash drifts, any side errored, or the armed side
injected zero failures (i.e. the sweep proved nothing).
"""
import json
import sys


def last_json_line(path):
    line = None
    for l in open(path):
        l = l.strip()
        if l.startswith('{"metric":"faults"'):
            line = l
    if line is None:
        raise SystemExit(f"no faults JSON line in {path}")
    return json.loads(line)


def main():
    armed = last_json_line(sys.argv[1])
    clean = last_json_line(sys.argv[2])
    assert armed["armed"] and not clean["armed"], "pass armed first, clean second"

    def drift(section):
        names = sorted(set(armed[section]) | set(clean[section]))
        return [n for n in names
                if armed[section].get(n, {}).get("hash")
                != clean[section].get(n, {}).get("hash")
                or armed[section].get(n, {}).get("hash") is None]

    out = {
        "metric": "faults_compare",
        "task_max_failures": armed["task_max_failures"],
        "injected_failures_armed": armed["injected_failures"],
        "n_queries": len(armed["queries"]),
        "n_appends": len(armed["appends"]),
        "query_hash_drift": drift("queries"),
        "append_hash_drift": drift("appends"),
        "clean": clean,
        "armed": armed,
    }
    json.dump(out, sys.stdout, indent=1)
    print()
    ok = (not out["query_hash_drift"] and not out["append_hash_drift"]
          and out["injected_failures_armed"] > 0
          and not armed["errors"] and not clean["errors"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
