#!/usr/bin/env python3
"""Ratchet committed per-query bench floors from a clean run.

Floors only ever go DOWN from new measurements (elementwise min of the
committed floor and the new clean-run median) — a lucky fast run
tightens the regression gate, a slow run never loosens it. Raising a
floor requires an explicit, named justification on the command line
(and a PLANS.md note), e.g. a floor that was provably recorded against
warm shared state.

Usage:
    tools/update_floors.py <BENCH_*.json> <floor.json> [raise name=sec ...]
"""
import json
import sys


def main():
    bench_path, floor_path = sys.argv[1], sys.argv[2]
    raises = {}
    args = sys.argv[3:]
    if args and args[0] == "raise":
        for kv in args[1:]:
            k, v = kv.split("=")
            raises[k] = float(v)
    bench = json.load(open(bench_path))
    floors = json.load(open(floor_path))
    meds = {k: v for k, v in bench["queries"].items() if v >= 0}
    lowered = raised = added = 0
    for name, med in sorted(meds.items()):
        old = floors.get(name)
        if old is None:
            floors[name] = round(med, 3)
            added += 1
        elif med < old:
            floors[name] = round(med, 3)
            lowered += 1
    for name, val in raises.items():
        print(f"RAISE {name}: {floors.get(name)} -> {val} (explicit)")
        floors[name] = val
        raised += 1
    out = "{\n" + ",\n".join(
        f'  "{k}": {json.dumps(floors[k])}' for k in sorted(floors)) + "\n}\n"
    open(floor_path, "w").write(out)
    print(f"{floor_path}: {lowered} lowered, {added} added, "
          f"{raised} raised, {len(floors)} total")


if __name__ == "__main__":
    main()
