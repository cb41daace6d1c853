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
    # Pins demand QUIET evidence — a degraded capture can't lower a pin
    # honestly (min() would keep the old one anyway) but could pin a NEW
    # query too high, flattering every later gate on it. Same a_eff and
    # threshold as benchgate's quiet tier (r18 calibration: fixed
    # accounting, steal counted half past the 0.5-core self-induced tax).
    amb = cap.get("ambient") or {}
    a_eff = amb.get("avg_cores", 0.0) + 0.5 * max(0.0, amb.get("steal_cores", 0.0) - 0.5)
    if a_eff > 0.35:
        print(f"REFUSING: effective ambient {a_eff:.2f} cores during the "
              "timed passes (> 0.35) — pins take quiet captures only",
              file=sys.stderr)
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

    # Row matching is ANCHORED to each table's header (advice r15): the
    # bare shapes `| qNN | n |` / `| bytes:qNN | n | n |` could otherwise
    # match a same-shaped row in any other section (e.g. a future table in
    # "Historical pins"), silently rewriting or appending pins to the
    # wrong table. Each table's extent = contiguous `|`-prefixed lines
    # after its unique header.
    sec_re = re.compile(r"^\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*$")
    byt_re = re.compile(r"^\|\s*bytes:(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|")
    sec_hdr = "| query | seconds |"
    byt_hdr = "| query (bytes:) | shuffle MB | spill MB |"

    sep_re = re.compile(r"^\|[\s\-:|]+\|\s*$")
    headers = {sec_hdr, byt_hdr}

    def table_extent(header):
        """(first_row_i, last_row_i) of the contiguous |-block after the
        unique header line (skipping the |---| separator); refuses a
        missing or duplicated header, and a header with no separator row
        (the walk would swallow the first data row as the separator).
        The walk also stops at another table's header or separator, so an
        EMPTY table abutting the next |-block cannot mis-scope the extent
        (review r15)."""
        hits = [i for i, ln in enumerate(lines) if ln.strip() == header]
        if len(hits) != 1:
            print(f"REFUSING: header {header!r} found {len(hits)} times "
                  f"(need exactly 1) — fix BASELINE.md first", file=sys.stderr)
            sys.exit(2)
        sep = hits[0] + 1
        if sep >= len(lines) or not sep_re.match(lines[sep]):
            print(f"REFUSING: header {header!r} has no |---| separator row "
                  f"— fix BASELINE.md first", file=sys.stderr)
            sys.exit(2)
        first = sep + 1
        last = first - 1
        while (last + 1 < len(lines) and lines[last + 1].startswith("|")
               and not sep_re.match(lines[last + 1])
               and lines[last + 1].strip() not in headers):
            last += 1
        return first, last

    sec_lo, sec_hi = table_extent(sec_hdr)
    byt_lo, byt_hi = table_extent(byt_hdr)
    seen_sec, seen_byt = set(), set()
    changed = []
    for i in range(byt_lo, byt_hi + 1):
        m = byt_re.match(lines[i])
        if not m:
            continue
        q, osh, osp = m.group(1), float(m.group(2)), float(m.group(3))
        seen_byt.add(q)
        if q in bs:
            nsh, nsp = bs[q]["sh_mb"], bs[q]["spill_mb"]
            drift = nsh > osh * 1.5 + 8 or osh > nsh * 1.5 + 8 or \
                nsp > osp * 2 + 64 or osp > nsp * 2 + 64
            if drift:
                lines[i] = f"| bytes:{q} | {nsh:.2f} | {nsp:.2f} |\n"
                changed.append(f"bytes:{q} {osh:.2f}->{nsh:.2f}")
    for i in range(sec_lo, sec_hi + 1):
        m = sec_re.match(lines[i])
        if not m:
            continue
        q, old = m.group(1), float(m.group(2))
        seen_sec.add(q)
        if q in qs and qs[q] < old:
            lines[i] = f"| {q} | {qs[q]:.2f} |\n"
            changed.append(f"{q} {old:.2f}->{qs[q]:.2f}")
    new_sec = [q for q in sorted(qs) if q not in seen_sec]
    new_byt = [q for q in sorted(bs) if q not in seen_byt]
    last_sec_i, last_byt_i = sec_hi, byt_hi
    if last_sec_i < last_byt_i:
        pass  # seconds table precedes bytes table: bytes-first insertion
        # below keeps the earlier (seconds) index valid
    else:
        print("REFUSING: seconds table does not precede bytes table — "
              "insertion order assumes it", file=sys.stderr)
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
