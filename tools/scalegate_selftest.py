#!/usr/bin/env python3
"""Self-test for tools/scalegate.py — synthetic sf1 captures/pins proving
every verdict class. Run: python3 tools/scalegate_selftest.py (exit 0 = ok).
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scalegate


PINS = ("| sf1:q01_agg | 1.00 | 9.00 |\n"
        "| sf1:q02_x | 2.00 | 25.00 |\n"
        "| q01_agg | 1.00 |\n")  # a benchgate-style row scalegate must ignore


def run_case(name, pins_md, capture, argv_extra=(), expect=None):
    with tempfile.TemporaryDirectory() as td:
        bp = os.path.join(td, "BENCH_SF1.json")
        mp = os.path.join(td, "BASELINE.md")
        with open(bp, "w") as f:
            json.dump(capture, f)
        with open(mp, "w") as f:
            f.write(pins_md)
        rc = scalegate.main([bp, mp, *argv_extra])
    status = "ok" if rc == expect else f"FAIL (rc={rc}, want {expect})"
    print(f"{name}: {status}")
    return rc == expect


def main():
    ok = True
    quiet = {"load": [0.1], "err": []}
    # 1. In-ratio capture with sane pinned scaling passes.
    ok &= run_case("pass", PINS,
                   {**quiet, "queries": {"q01_agg": 10.0, "q02_x": 24.0}}, expect=0)
    # 2. >2x regression vs the sf1 pin fails.
    ok &= run_case("fail_regress", PINS,
                   {**quiet, "queries": {"q01_agg": 19.0, "q02_x": 24.0}}, expect=1)
    # 3. Captured-but-unpinned sf1 query fails (closed under registration).
    ok &= run_case("fail_unpinned", PINS,
                   {**quiet, "queries": {"q01_agg": 9.0, "q99_new": 5.0}}, expect=1)
    # 4. A pinned SUPER-LINEAR scaling ratio fails even if the capture agrees.
    superlin = PINS + "| sf1:q03_bad | 0.50 | 40.00 |\n"
    ok &= run_case("fail_superlinear", superlin,
                   {**quiet, "queries": {"q03_bad": 39.0}}, expect=1)
    # 5. Crash in err array fails.
    ok &= run_case("fail_crash", PINS,
                   {**quiet, "queries": {"q01_agg": 9.0}, "err": ["q02_x"]}, expect=1)
    # 6. Hot capture unusable.
    ok &= run_case("unusable_hot", PINS,
                   {"load": [5.0], "err": [], "queries": {"q01_agg": 9.0}}, expect=2)
    # 7. Custom --max-scale is honored (12.5x passes at 15).
    ok &= run_case("pass_custom_scale", PINS,
                   {**quiet, "queries": {"q02_x": 24.0}},
                   argv_extra=("--max-scale", "15"), expect=0)
    # 8. Dangling flag value is a usage error.
    ok &= run_case("usage_dangling", PINS,
                   {**quiet, "queries": {"q01_agg": 9.0}},
                   argv_extra=("--ratio",), expect=2)
    # 9. --full: an sf1-pinned query missing from the capture fails.
    ok &= run_case("fail_uncaptured_full", PINS,
                   {**quiet, "queries": {"q01_agg": 9.0}},
                   argv_extra=("--full",), expect=1)
    # 10. Same capture without --full only notes the missing pin row.
    ok &= run_case("pass_uncaptured_default", PINS,
                   {**quiet, "queries": {"q01_agg": 9.0}}, expect=0)
    # --- sf1 skew gate (the round-13 verdict's demand: hot-task
    #     concentration at SCALE gets its own adjudication lane) ---
    base_q = {**quiet, "queries": {"q01_agg": 9.0, "q02_x": 24.0}}
    # 11. A whale task at sf1 fails even though seconds are inside pins.
    whale = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                         "max_task_s": 7.0, "med_task_s": 0.25,
                         "peer_med_s": 0.3}}
    ok &= run_case("fail_sf1_skew", PINS, {**base_q, "bytes": whale}, expect=1)
    # 12. A uniform heavy stage passes: max ~= its own stage's peer median
    #     even though the whole-query median is bookkeeping-diluted.
    uniform = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                           "max_task_s": 7.0, "med_task_s": 0.02,
                           "peer_med_s": 5.5}}
    ok &= run_case("pass_sf1_uniform_stage", PINS,
                   {**base_q, "bytes": uniform}, expect=0)
    # 13. sf1-skew-ok allowlists the query — benchgate's skew-ok must NOT.
    ok &= run_case("pass_sf1_skew_allowlisted",
                   PINS + "| sf1-skew-ok:q01_agg | measured CPU-bucket shape |\n",
                   {**base_q, "bytes": whale}, expect=0)
    ok &= run_case("fail_sf1_skew_wrong_lane",
                   PINS + "| skew-ok:q01_agg | sf0.1 lane must not leak |\n",
                   {**base_q, "bytes": whale}, expect=1)
    # 14. Pre-peer artifacts fall back to med_task_s.
    legacy = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                          "max_task_s": 7.0, "med_task_s": 4.0}}
    ok &= run_case("pass_sf1_skew_legacy_med", PINS,
                   {**base_q, "bytes": legacy}, expect=0)
    # 15. --skew-ratio is honored.
    ok &= run_case("pass_sf1_custom_skew_ratio", PINS,
                   {**base_q, "bytes": whale},
                   argv_extra=("--skew-ratio", "30"), expect=0)
    if not ok:
        print("SELFTEST FAIL")
        return 1
    print("SELFTEST PASS (16 cases)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
