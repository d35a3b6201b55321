#!/usr/bin/env python3
"""Turn a graft.Bench JSON line into pins.json (query -> min-of-3 sec).

Usage: python3 tools/make_pins.py bench_output.json [> pins.json]
       ... | python3 tools/make_pins.py - > pins.json

Run the bench on a QUIET box (load_before well under ~1.7) before
pinning: pins are the 2x-recheck reference graft.Bench adjudicates
against, so a load-inflated pin would mask real regressions and a
quiet pin flags co-tenant spikes for automatic recheck.
"""
import json
import sys

src = sys.stdin if len(sys.argv) < 2 or sys.argv[1] == "-" else open(sys.argv[1])
for line in src:
    line = line.strip()
    if '"metric"' not in line:
        continue
    if line.startswith("[info]"):
        line = line[len("[info]"):].strip()
    d = json.loads(line)
    if d.get("load_before", 0) > 1.7:
        print(f"warning: load_before={d['load_before']} — pin from a quieter run "
              "if possible", file=sys.stderr)
    print(json.dumps(dict(sorted(d["queries"].items())), indent=1))
    break
