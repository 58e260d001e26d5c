#!/usr/bin/env python3
"""Fold one or more full-sweep BENCH_FULL.json files into
WARM_FLOORS.json: floors are the MINIMUM of the committed floor and
every supplied sweep (a floor only ever ratchets down). New queries
get min-across-sweeps as their first floor. Queries whose measured
semantics changed (fixture moved out of the cell) ratchet down
automatically. Run from the repo root.

--rebase: floors become min-across-THESE-sweeps even where that is
HIGHER than the committed floor. Only for a measurement-semantics
change that makes cells legitimately slower (e.g. the r13 switch from
count() — which column-pruned projection-only queries down to a bare
scan — to the noop sink, which evaluates every output column). Each
raise is printed; the commit must say why."""
import json
import os
import sys

argv = sys.argv[1:]
FLOORS = "WARM_FLOORS.json"
if "--floors" in argv:
    i = argv.index("--floors")
    FLOORS = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
args = [a for a in argv if a != "--rebase"]
REBASE = "--rebase" in argv
sweeps = [json.load(open(p)) for p in args]
assert sweeps, ("usage: update_floors.py [--rebase] "
                "[--floors FLOORS.json] sweep1.json [...]")
# a missing ledger seeds from the first sweep (the 100x ledger's
# bootstrap path: run A seeds floors, run B is the artifact of record)
if os.path.exists(FLOORS):
    wf = json.load(open(FLOORS))
else:
    wf = {"warm_floors": {}, "sf": sweeps[0].get("sf"),
          "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32"))}
floors = wf["warm_floors"]
names = set()
for s in sweeps:
    assert s.get("sf") == wf.get("sf"), (s.get("sf"), wf.get("sf"))
    names.update(s["queries"].keys())
changed = []
for n in sorted(names):
    # never ratchet from a crashed cell (Bench >= r13 excludes failed
    # queries from "queries" and lists them under "failed"; the guard
    # also protects against artifacts from older binaries)
    vals = [s["queries"][n] for s in sweeps
            if n in s["queries"] and s["queries"][n] > 0
            and n not in s.get("failed", {})]
    if not vals:
        continue
    m = round(min(vals), 3)
    old = floors.get(n)
    if old is None or m < old or (REBASE and m != old):
        floors[n] = m
        changed.append((n, old, m))
# the streaming-ambience gauges' floors ride the same ledger under
# reserved keys: Bench emits the sweep's quietest 4KiB write+force
# reading as io_fsync_ms and the quietest two-batch micro-stream
# round-trip as stream_probe_s; min-merge them exactly like query
# floors (Bench reads them back out separately — never as cells)
for gk in ("io_fsync_ms", "stream_probe_s"):
    vals = [s[gk] for s in sweeps
            if isinstance(s.get(gk), (int, float)) and s[gk] > 0]
    if vals:
        m = round(min(vals), 3)
        old = floors.get(gk)
        if old is None or m < old or (REBASE and m != old):
            floors[gk] = m
            changed.append((gk, old, m))
wf["warm_floors"] = dict(sorted(floors.items()))
json.dump(wf, open(FLOORS, "w"), indent=1)
print(f"{len(changed)} floors updated/added:")
for n, old, m in changed:
    print(f"  {n}: {old} -> {m}")
# Suggested commit lines carry the value RE-READ from the committed
# ledger file — never an intermediate measured number. (r15 shipped a
# commit message saying dedup_ngram 0.473 while the ledger said 0.701:
# the prose quoted one sweep's cell, the ledger held the min-merge.
# Future rounds grep commit prose, so the two must never drift.)
if changed:
    written = json.load(open(FLOORS))["warm_floors"]
    print("suggested commit lines (ledger-exact — paste, don't retype):")
    for n, old, m in changed:
        prev = "new" if old is None else f"{old}"
        print(f"  {n} floor {prev} -> {written[n]}")
