#!/usr/bin/env python3
"""Scaling-curve gate: check an sf1 (10x data) capture of the heavy query
family against BASELINE.md's pinned sf1 rows and the sf0.1 pins.

BASELINE.md carries a dedicated sf1 table whose rows are prefixed `sf1:`
so benchgate's sf0.1 pin parser can never confuse the two:

    | sf1:q42_dup_clusters | 2.20 | 21.5 |

columns: query (prefixed), sf0.1 pin (seconds), sf1 pin (seconds).

Verdicts, per query in the capture:
  - REGRESS:  capture time > --ratio (default 2.0) x its sf1 pin — same
    noise protocol as benchgate, at the sf1 scale point.
  - SUPERLIN: the PINNED scaling ratio (sf1 pin / sf0.1 pin) exceeds
    --max-scale (default 30 = 10x data x 3 headroom; sub-second sf0.1
    rows are fixed-cost-dominated, so generous headroom is honest).
  - UNPINNED: a captured query with no sf1 pin row (closed under
    registration, the benchgate rule).
  - UNCAPTURED (--full only): an sf1-pinned query absent from the
    capture — closes the gate in the OTHER direction, so a pin can
    never outlive the evidence behind it (round-11 shipped a q149 pin
    whose committed capture lacked the row; --full makes that a
    failure, mirroring benchgate --full).
  - SKEW:     max_task_s > --skew-ratio (default 3.0) x peer_med_s + 1 s
    (peer_med_s = median task of the max task's own stage; falls back to
    med_task_s for pre-peer artifacts) unless the query carries a
    `| sf1-skew-ok:qNN | <reason> |` allowlist row — sf1's own lane, NOT
    benchgate's sf0.1 `skew-ok` rows: hot-task concentration that grows
    with scale is exactly what the sf0.1 +1 s grace masks, so each scale
    point adjudicates its own exceptions (round-13 verdict). Entries
    without skew fields are skipped (the --full closure forces fresh
    captures when pins exist).
  - CRASH:    a query in the capture's err array.

Usage: python3 tools/scalegate.py [BENCH_SF1.json] [BASELINE.md]
                                  [--ratio 2.0] [--max-scale 30]
                                  [--skew-ratio 3.0] [--full]
Exit codes: 0 pass, 1 failures, 2 unusable inputs.
Self-test: python3 tools/scalegate_selftest.py
"""
import json
import re
import sys


def parse_sf1_pins(path):
    """{query: (sf01_pin, sf1_pin)} from `| sf1:qNN | a | b |` rows."""
    pins = {}
    row = re.compile(r"^\|\s*sf1:(q\w+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|")
    with open(path) as f:
        for line in f:
            m = row.match(line)
            if m:
                pins[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return pins


def parse_sf1_skew_allowlist(path):
    """{query} from `| sf1-skew-ok:qNN | reason |` rows."""
    allow = set()
    row = re.compile(r"^\|\s*sf1-skew-ok:(q\w+)\s*\|")
    with open(path) as f:
        for line in f:
            m = row.match(line)
            if m:
                allow.add(m.group(1))
    return allow


def check_skew(cap, allow, skew_ratio, failures):
    """Whale-key verdicts at the sf1 scale point — benchgate's rule
    verbatim (single-sourced import), with sf1's own allowlist lane and
    message tag."""
    import benchgate
    benchgate.check_skew(
        cap, allow, skew_ratio, failures, where=" at sf1",
        hint="(fix the plan or add an sf1-skew-ok row with the measured reason)")


def main(argv):
    ratio, max_scale, skew_ratio, full = 2.0, 30.0, 3.0, False
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--full":
            full = True
            i += 1
            continue
        for flag, setter in (("--ratio", "ratio"), ("--max-scale", "max_scale"),
                             ("--skew-ratio", "skew_ratio")):
            if a.startswith(flag):
                if "=" in a:
                    val = float(a.split("=", 1)[1])
                else:
                    if i + 1 >= len(argv):
                        print(f"usage: scalegate.py [BENCH_SF1.json] [BASELINE.md]"
                              f" [--ratio N] [--max-scale N] [--skew-ratio N]"
                              f"  (missing value for {flag})")
                        return 2
                    val = float(argv[i + 1])
                    i += 1
                if setter == "ratio":
                    ratio = val
                elif setter == "max_scale":
                    max_scale = val
                else:
                    skew_ratio = val
                break
        else:
            if not a.startswith("--"):
                args.append(a)
        i += 1
    bench_path = args[0] if len(args) > 0 else "BENCH_SF1.json"
    base_path = args[1] if len(args) > 1 else "BASELINE.md"

    try:
        with open(bench_path) as f:
            cap = json.loads(f.read().strip())
    except (OSError, ValueError) as e:
        print(f"GATE UNUSABLE: cannot read {bench_path}: {e}")
        return 2
    pins = parse_sf1_pins(base_path)
    if not pins:
        print(f"GATE UNUSABLE: no sf1: pins parsed from {base_path}")
        return 2

    load_arr = cap.get("load") or [None]
    load = load_arr[0] if load_arr else None
    if cap.get("hot") or (load is not None and load > 1.5):
        print(f"GATE UNUSABLE: capture is hot (start load {load}) — re-run quiet")
        return 2

    queries = cap.get("queries", {})
    failures = []
    for q in cap.get("err", []):
        failures.append(f"CRASH  {q}: in err array (no timing)")
    check_skew(cap, parse_sf1_skew_allowlist(base_path), skew_ratio, failures)
    for q, t in sorted(queries.items()):
        if q not in pins:
            failures.append(f"UNPINNED {q}: {t:.2f}s at sf1 but no sf1: pin row")
            continue
        p01, p1 = pins[q]
        r = t / p1 if p1 > 0 else float("inf")
        if r > ratio:
            failures.append(
                f"REGRESS {q}: {t:.2f}s vs sf1 pin {p1:.2f}s = {r:.2f}x (> {ratio}x)")
    for q, (p01, p1) in sorted(pins.items()):
        scale = p1 / p01 if p01 > 0 else float("inf")
        if scale > max_scale:
            failures.append(
                f"SUPERLIN {q}: pinned scaling {p1:.2f}/{p01:.2f} = {scale:.1f}x "
                f"for 10x data (> {max_scale}x)")
        if q not in queries:
            if full:
                failures.append(
                    f"UNCAPTURED {q}: sf1-pinned but absent from capture "
                    f"(--full: pins must carry committed evidence)")
            else:
                print(f"note   {q}: sf1-pinned but absent from capture")

    if failures:
        print("\n".join(failures))
        print(f"GATE FAIL: {len(failures)} issue(s)")
        return 1
    total = sum(queries.values())
    pinned = sum(pins[q][1] for q in queries if q in pins)
    n_skew = len([q for q, b in (cap.get("bytes") or {}).items()
                  if "max_task_s" in b])
    print(f"GATE PASS: {len([q for q in queries if q in pins])} sf1 queries within "
          f"{ratio}x of pins; total {total:.1f}s vs pinned {pinned:.1f}s; "
          f"all pinned scaling ratios <= {max_scale}x; "
          f"{n_skew} skew entries within {skew_ratio}x peer + 1 s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
