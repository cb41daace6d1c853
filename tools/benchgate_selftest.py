#!/usr/bin/env python3
"""Self-test for tools/benchgate.py: proves the gate's verdict logic on
synthetic captures/pins, including the round-11 closure rule that a
captured-but-unpinned query FAILS the gate (q145 shipped unpinned in
round 10 because the old gate only printed a note).

Run: python3 tools/benchgate_selftest.py  (exit 0 = all cases pass)
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import benchgate


def run_case(name, pins_md, capture, argv_extra=(), expect=None):
    with tempfile.TemporaryDirectory() as td:
        bp = os.path.join(td, "BENCH.json")
        mp = os.path.join(td, "BASELINE.md")
        with open(bp, "w") as f:
            json.dump(capture, f)
        with open(mp, "w") as f:
            f.write(pins_md)
        rc = benchgate.main([bp, mp, *argv_extra])
    status = "ok" if rc == expect else f"FAIL (rc={rc}, want {expect})"
    print(f"{name}: {status}")
    return rc == expect


PINS = "| q01_agg | 1.00 |\n| q02_x | 2.00 |\n"


def main():
    ok = True
    quiet = {"load": [0.1], "err": []}
    # 1. In-ratio capture passes.
    ok &= run_case("pass_within_ratio", PINS,
                   {**quiet, "queries": {"q01_agg": 1.5, "q02_x": 2.0}}, expect=0)
    # 2. >2x regression fails.
    ok &= run_case("fail_regression", PINS,
                   {**quiet, "queries": {"q01_agg": 2.5, "q02_x": 2.0}}, expect=1)
    # 3. Crashed query (err array) fails.
    ok &= run_case("fail_crash", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0}, "err": ["q02_x"]}, expect=1)
    # 4. Hot capture is unusable, not a pass.
    ok &= run_case("unusable_hot", PINS,
                   {"load": [9.0], "err": [], "queries": {"q01_agg": 1.0}}, expect=2)
    # 5. THE CLOSURE RULE: a captured query with no pin row fails.
    ok &= run_case("fail_unpinned", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0, "q99_new": 0.2}}, expect=1)
    # 6. Subset capture (pinned query absent) still passes — only noted.
    ok &= run_case("pass_subset", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0}}, expect=0)
    # 7. Custom ratio is honored (1.5x regression passes at --ratio 3).
    ok &= run_case("pass_custom_ratio", PINS,
                   {**quiet, "queries": {"q01_agg": 2.5, "q02_x": 2.0}},
                   argv_extra=("--ratio", "3"), expect=0)
    # 8b. --full: a pinned query absent from the capture fails.
    ok &= run_case("fail_full_absent", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0}},
                   argv_extra=("--full",), expect=1)
    # 8c. --full passes when every pinned query is present.
    ok &= run_case("pass_full_complete", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0, "q02_x": 2.0}},
                   argv_extra=("--full",), expect=0)
    # 8. Dangling --ratio is a usage error, not a traceback.
    ok &= run_case("usage_dangling_ratio", PINS,
                   {**quiet, "queries": {"q01_agg": 1.0}},
                   argv_extra=("--ratio",), expect=2)

    # --- bytes gate ---
    BPINS = PINS + "| bytes:q01_agg | 10.00 | 0.00 |\n| bytes:q02_x | 500.00 | 0.00 |\n"
    times = {"queries": {"q01_agg": 1.0, "q02_x": 2.0}}
    good_bytes = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0},
                  "q02_x": {"sh_mb": 510.0, "spill_mb": 0.0}}
    # 11. Bytes within ratio+slack pass (510 vs 500: inside 1.5x).
    ok &= run_case("pass_bytes", BPINS,
                   {**quiet, **times, "bytes": good_bytes}, expect=0)
    # 12. THE POINT: an injected broadcast-loss blows bytes past the gate
    #     while its seconds stay inside the 2x noise band.
    lost_broadcast = {"q01_agg": {"sh_mb": 900.0, "spill_mb": 0.0},
                      "q02_x": good_bytes["q02_x"]}
    ok &= run_case("fail_bytes_broadcast_loss", BPINS,
                   {**quiet, "queries": {"q01_agg": 1.4, "q02_x": 2.0},
                    "bytes": lost_broadcast}, expect=1)
    # 13. Sustained spill where the pin has none fails.
    ok &= run_case("fail_spill", BPINS,
                   {**quiet, **times,
                    "bytes": {**good_bytes,
                              "q02_x": {"sh_mb": 510.0, "spill_mb": 200.0}}},
                   expect=1)
    # 14. Bytes captured for a query with no bytes pin fails (registration).
    ok &= run_case("fail_unpinned_bytes", PINS,
                   {**quiet, **times,
                    "bytes": {"q01_agg": {"sh_mb": 1.0, "spill_mb": 0.0}}},
                   expect=1)
    # 15. Pre-bytes capture (no bytes block) still passes without --full...
    ok &= run_case("pass_legacy_no_bytes", BPINS, {**quiet, **times}, expect=0)
    # 16. ...but --full demands the evidence behind existing bytes pins.
    ok &= run_case("fail_full_no_bytes", BPINS, {**quiet, **times},
                   argv_extra=("--full",), expect=1)
    # 17. --full: a timed, bytes-pinned query missing from the bytes block fails.
    ok &= run_case("fail_full_bytes_hole", BPINS,
                   {**quiet, **times,
                    "bytes": {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0}}},
                   argv_extra=("--full",), expect=1)
    # 18. --bytes-ratio is honored (2.2x shuffle passes at 3).
    ok &= run_case("pass_custom_bytes_ratio", BPINS,
                   {**quiet, **times,
                    "bytes": {**good_bytes,
                              "q02_x": {"sh_mb": 1100.0, "spill_mb": 0.0}}},
                   argv_extra=("--bytes-ratio", "3"), expect=0)
    # --- skew gate ---
    # 19. THE POINT: an injected whale key moves max/median task time where
    #     seconds and total bytes both read healthy.
    hot_key = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                           "max_task_s": 9.0, "med_task_s": 0.4},
               "q02_x": good_bytes["q02_x"]}
    ok &= run_case("fail_skew_whale_key", BPINS,
                   {**quiet, **times, "bytes": hot_key}, expect=1)
    # 20. Balanced tasks pass (max inside 3x median + 1 s).
    balanced = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                            "max_task_s": 1.9, "med_task_s": 0.5},
                "q02_x": good_bytes["q02_x"]}
    ok &= run_case("pass_skew_balanced", BPINS,
                   {**quiet, **times, "bytes": balanced}, expect=0)
    # 21. Sub-second max can never fail: the +1 s slack exempts fixed-cost
    #     and single-task-by-construction queries (median 0).
    tiny = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                        "max_task_s": 0.9, "med_task_s": 0.0},
            "q02_x": good_bytes["q02_x"]}
    ok &= run_case("pass_skew_subsecond", BPINS,
                   {**quiet, **times, "bytes": tiny}, expect=0)
    # 22. A skew-ok allowlist row exempts a documented deliberate shape.
    ok &= run_case("pass_skew_allowlisted",
                   BPINS + "| skew-ok:q01_agg | deliberate single-key probe |\n",
                   {**quiet, **times, "bytes": hot_key}, expect=0)
    # 23. Pre-skew artifacts (no skew fields) skip the gate silently.
    ok &= run_case("pass_skew_legacy_fields", BPINS,
                   {**quiet, **times, "bytes": good_bytes}, expect=0)
    # 24. --skew-ratio is honored (9x/0.4 passes at ratio 25).
    ok &= run_case("pass_custom_skew_ratio", BPINS,
                   {**quiet, **times, "bytes": hot_key},
                   argv_extra=("--skew-ratio", "25"), expect=0)
    # 25. peer_med_s, when present, is the comparator: a uniform heavy
    #     stage (max ~= peer median) passes even though the whole-query
    #     median would read as a 190x whale.
    uniform_stage = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                                 "max_task_s": 4.5, "med_task_s": 0.02,
                                 "peer_med_s": 3.8},
                     "q02_x": good_bytes["q02_x"]}
    ok &= run_case("pass_skew_uniform_stage_peer", BPINS,
                   {**quiet, **times, "bytes": uniform_stage}, expect=0)
    # 26. ...and a task that outruns its OWN stage's peers fails even when
    #     the whole-query median would have excused it via the +1 s slack.
    stage_whale = {"q01_agg": {"sh_mb": 10.0, "spill_mb": 0.0,
                               "max_task_s": 4.5, "med_task_s": 1.2,
                               "peer_med_s": 0.1},
                   "q02_x": good_bytes["q02_x"]}
    ok &= run_case("fail_skew_stage_whale_peer", BPINS,
                   {**quiet, **times, "bytes": stage_whale}, expect=1)

    # --- ambient gate (the round-16 blind spot: start quiet, mid-run hot) ---
    # 27. Ambient block over 1 foreign core avg → unusable, even though the
    #     start load was quiet and every timing is in ratio.
    ok &= run_case("unusable_ambient_hot", PINS,
                   {"load": [0.2, 4.5], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0},
                    "ambient": {"cpu_s": 500.0, "wall_s": 140.0,
                                "avg_cores": 3.57}}, expect=2)
    # 28. Quiet ambient block passes — a high END loadavg alone cannot
    #     gate (it is the bench's own local[N] work; sf1 captures end ~19).
    ok &= run_case("pass_ambient_quiet_high_end_load", PINS,
                   {"load": [0.2, 19.4], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0},
                    "ambient": {"cpu_s": 20.0, "wall_s": 200.0,
                                "avg_cores": 0.10}}, expect=0)
    # 29. Pre-ambient artifact with a hot end load only WARNS (still rc 0):
    #     old artifacts stay adjudicable, but the gate now demands re-times.
    ok &= run_case("warn_legacy_end_load", PINS,
                   {"load": [0.2, 4.5], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0}}, expect=0)

    # --- ambient tiers on a_eff = avg_cores + 0.5*max(0, steal-0.5)
    #     (r18 calibration: fixed accounting, steal counted half past the
    #     self-induced 0.5-core overcommit tax) ---
    # 30. DEGRADED band: a_eff=0.60 widens the allowance to 2*(1+1.2)=4.4x;
    #     a 2.8x row (the r17 phantom class) is a SUSPECT note, not a
    #     failure.
    ok &= run_case("pass_degraded_row_inside_widened_band", PINS,
                   {"load": [0.2, 1.6], "err": [],
                    "queries": {"q01_agg": 2.8, "q02_x": 2.0},
                    "ambient": {"cpu_s": 120.0, "wall_s": 200.0,
                                "avg_cores": 0.60}}, expect=0)
    # 31. ...but a row past the WIDENED band still fails — degraded is a
    #     wider gate, not an open one.
    ok &= run_case("fail_degraded_row_past_widened_band", PINS,
                   {"load": [0.2, 1.6], "err": [],
                    "queries": {"q01_agg": 4.6, "q02_x": 2.0},
                    "ambient": {"cpu_s": 120.0, "wall_s": 200.0,
                                "avg_cores": 0.60}}, expect=1)
    # 32. Quiet tier: a_eff <= 0.35 adjudicates at the strict ratio even
    #     with sub-floor steal present (steal 0.45 < 0.5 contributes 0).
    ok &= run_case("fail_quiet_tier_strict", PINS,
                   {"load": [0.2, 1.6], "err": [],
                    "queries": {"q01_agg": 2.8, "q02_x": 2.0},
                    "ambient": {"cpu_s": 60.0, "wall_s": 200.0,
                                "avg_cores": 0.30, "steal_cores": 0.45}},
                   expect=1)
    # 33. a_eff > 1.0 is unusable.
    ok &= run_case("unusable_ambient_over_core", PINS,
                   {"load": [0.2, 2.0], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0},
                    "ambient": {"cpu_s": 240.0, "wall_s": 200.0,
                                "avg_cores": 1.20}}, expect=2)
    # 34. Steal folds in at half past the floor: avg 0.2 + steal 2.3 →
    #     a_eff = 0.2 + 0.9 = 1.1 → unusable (a deprived capture cannot
    #     adjudicate even though in-VM foreign CPU looks quiet).
    ok &= run_case("unusable_steal_deprivation", PINS,
                   {"load": [0.2, 2.0], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0},
                    "ambient": {"cpu_s": 40.0, "wall_s": 200.0,
                                "avg_cores": 0.20, "steal_cores": 2.30}},
                   expect=2)
    # 35. Sub-floor steal on a quiet capture stays a clean PASS (the
    #     saturated local[32] self-tax must not self-flag).
    ok &= run_case("pass_quiet_with_self_steal", PINS,
                   {"load": [0.2, 1.6], "err": [],
                    "queries": {"q01_agg": 1.0, "q02_x": 2.0},
                    "ambient": {"cpu_s": 60.0, "wall_s": 200.0,
                                "avg_cores": 0.30, "steal_cores": 0.45}},
                   expect=0)

    if not ok:
        print("SELFTEST FAIL")
        return 1
    print("SELFTEST PASS (35 cases)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
