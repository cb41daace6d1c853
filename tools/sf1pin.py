#!/usr/bin/env python3
"""Regenerate BASELINE.md's sf1 scaling table from N quiet sf1 captures.

Usage: python3 tools/sf1pin.py BENCH_SF1_a.json [BENCH_SF1_b.json ...]

Per query: sf1 pin = min over the given captures (each already min-of-two
passes inside graft.Bench); sf0.1 pin read from BASELINE.md's seconds
table; ratio = sf1/sf0.1 rounded to 0.1x. Prints the replacement table
rows to stdout — the surrounding prose is maintained by hand. Existing
sf1 pins are kept when LOWER than the fresh min (a pin is the best
evidenced quiet number; a slower re-capture must not loosen the gate).
"""
import json
import re
import sys


def main(argv):
    caps = []
    for p in argv:
        with open(p) as f:
            caps.append(json.load(f))
    for c in caps:
        if c.get("hot") or c.get("load", [0])[0] > 1.5:
            print(f"REFUSING: hot capture (load {c.get('load')})", file=sys.stderr)
            return 2
        if c.get("err"):
            print(f"REFUSING: capture has errs {c['err']}", file=sys.stderr)
            return 2
    sf01 = {}
    sf1_old = {}
    with open("BASELINE.md") as f:
        for line in f:
            m = re.match(r"^\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*$", line)
            if m:
                sf01[m.group(1)] = float(m.group(2))
            m = re.match(r"^\|\s*sf1:(q\w+)\s*\|\s*[0-9.]+\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                sf1_old[m.group(1)] = float(m.group(2))
    names = sorted(set().union(*[c["queries"].keys() for c in caps]))
    for n in names:
        vals = [c["queries"][n] for c in caps if n in c["queries"]]
        pin = min(vals)
        if n in sf1_old and sf1_old[n] < pin:
            pin = sf1_old[n]
        base = sf01.get(n)
        if base is None:
            print(f"MISSING sf0.1 pin for {n}", file=sys.stderr)
            continue
        print(f"| sf1:{n} | {base:.2f} | {pin:.2f} | {pin / base:.1f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
