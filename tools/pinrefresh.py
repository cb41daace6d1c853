#!/usr/bin/env python3
"""Refresh BASELINE.md's sf0.1 seconds and bytes pins from a fresh quiet
committed capture (BENCH_LOCAL.json).

Policy (the round-13 rule "pins follow the committed evidence"):
  - seconds pin := min(old pin, capture) — a pin is the best evidenced
    quiet number; a slower re-capture inside the 2x gate doesn't loosen
    it. A NEW query gets the capture value.
  - bytes pin := the capture value when it drifted beyond the gate slack
    in EITHER direction (bytes are plan-deterministic, so real drift
    means the PLAN changed and the old pin documents a plan that no
    longer exists); kept otherwise. A NEW query gets the capture values.

Prints replacement `| qNN | s |` and `| bytes:qNN | sh | sp |` rows to
stdout and edits BASELINE.md in place (only existing rows are rewritten;
new rows are appended to the respective tables). Refuses hot captures.

Usage: python3 tools/pinrefresh.py [BENCH_LOCAL.json] [BASELINE.md]
"""
import json
import re
import sys


def main(argv):
    bench = argv[0] if len(argv) > 0 else "BENCH_LOCAL.json"
    base = argv[1] if len(argv) > 1 else "BASELINE.md"
    with open(bench) as f:
        cap = json.load(f)
    if cap.get("hot") or cap.get("load", [0])[0] > 1.5:
        print(f"REFUSING: hot capture (load {cap.get('load')})", file=sys.stderr)
        return 2
    if cap.get("err"):
        print(f"REFUSING: capture has errs {cap['err']}", file=sys.stderr)
        return 2
    # sf-lane guard (review r14): these tables pin the sf0.1 lane; an sf1
    # capture's ~10x bytes would silently loosen every bytes pin.
    sf = cap.get("sf", "").rstrip("/")
    if not sf.endswith("sf0.1"):
        print(f"REFUSING: capture sf lane is '{sf}', not sf0.1 — these "
              f"tables pin sf0.1 (sf1 pins: tools/sf1pin.py)", file=sys.stderr)
        return 2
    qs, bs = cap["queries"], cap.get("bytes", {})

    with open(base) as f:
        lines = f.readlines()

    sec_re = re.compile(r"^\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*$")
    byt_re = re.compile(r"^\|\s*bytes:(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|")
    seen_sec, seen_byt = set(), set()
    last_sec_i, last_byt_i = None, None
    changed = []
    for i, line in enumerate(lines):
        m = byt_re.match(line)
        if m:
            q, osh, osp = m.group(1), float(m.group(2)), float(m.group(3))
            seen_byt.add(q)
            last_byt_i = i
            if q in bs:
                nsh, nsp = bs[q]["sh_mb"], bs[q]["spill_mb"]
                drift = nsh > osh * 1.5 + 8 or osh > nsh * 1.5 + 8 or \
                    nsp > osp * 2 + 64 or osp > nsp * 2 + 64
                if drift:
                    lines[i] = f"| bytes:{q} | {nsh:.2f} | {nsp:.2f} |\n"
                    changed.append(f"bytes:{q} {osh:.2f}->{nsh:.2f}")
            continue
        m = sec_re.match(line)
        if m:
            q, old = m.group(1), float(m.group(2))
            seen_sec.add(q)
            last_sec_i = i
            if q in qs and qs[q] < old:
                lines[i] = f"| {q} | {qs[q]:.2f} |\n"
                changed.append(f"{q} {old:.2f}->{qs[q]:.2f}")
    new_sec = [q for q in sorted(qs) if q not in seen_sec]
    new_byt = [q for q in sorted(bs) if q not in seen_byt]
    if (new_sec and last_sec_i is None) or (new_byt and last_byt_i is None):
        print("REFUSING: new rows to add but the target table has no "
              "existing rows to anchor them — create the table first",
              file=sys.stderr)
        return 2
    # append new rows right after the last row of each table (reverse order
    # keeps earlier insertion indexes valid)
    for q in reversed(new_byt):
        b = bs[q]
        lines.insert(last_byt_i + 1,
                     f"| bytes:{q} | {b['sh_mb']:.2f} | {b['spill_mb']:.2f} |\n")
        changed.append(f"NEW bytes:{q} {b['sh_mb']:.2f}")
    for q in reversed(new_sec):
        lines.insert(last_sec_i + 1, f"| {q} | {qs[q]:.2f} |\n")
        changed.append(f"NEW {q} {qs[q]:.2f}")

    with open(base, "w") as f:
        f.writelines(lines)
    for c in changed:
        print(c)
    print(f"{len(changed)} pin(s) updated; {len(new_sec)} new seconds, "
          f"{len(new_byt)} new bytes rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
