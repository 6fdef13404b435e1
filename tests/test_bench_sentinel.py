"""The interleaved-sentinel flagging rule (r10 — closes the r9 bench
blind spot: a sustained mid-sweep load inflated dozens of unchanged
queries 1.3-1.7x while both ENDPOINT probes read clean and no per-query
spread tripped; the per-segment probe series makes that mode
machine-flaggable from the BENCH record alone).

Pure tests: ``sentinel_suspects`` is deliberately Spark-free so the rule
can be re-applied to any past record's ``sentinel.series``.
"""

from __future__ import annotations

import os

import json

from bench import (
    baseline_rows,
    compact_record,
    diffuse_contention,
    inflated_queries,
    merge_retry,
    sentinel_suspects,
)


def _names(n: int) -> list[str]:
    return [f"q{i:02d}" for i in range(n)]


def test_quiet_session_flags_nothing():
    marks = [(0, 0.15), (8, 0.14), (16, 0.16), (20, 0.15)]
    assert sentinel_suspects(marks, _names(20)) == {}


def test_measured_quiet_sweep_flags_nothing():
    # the actual r10 quiet-session series (the probe's residual JIT
    # settling spreads 1.58x against the raw min — the reason the rule's
    # reference is the SECOND-smallest probe, not the min)
    marks = [
        (0, 0.198), (8, 0.167), (16, 0.167), (24, 0.185),
        (32, 0.172), (40, 0.152), (48, 0.175), (50, 0.125),
    ]
    assert sentinel_suspects(marks, _names(50)) == {}


def test_mid_sweep_load_with_clean_endpoints_is_flagged():
    # the r9 signature: endpoints quiet, the middle segment contended —
    # the two-point sentinel read drift 1.0 and missed it entirely
    marks = [(0, 0.15), (8, 0.45), (16, 0.44), (20, 0.15)]
    got = sentinel_suspects(marks, _names(20))
    # a hot probe taints BOTH adjacent segments (the probe reads machine
    # state at the boundary; either neighbor may have absorbed the
    # load), so with hot probes at 8 and 16 every query is bracketed by
    # at least one: 0..7 by (0.15, 0.45), 8..15 by (0.45, 0.44), 16..19
    # by (0.44, 0.15) — deliberately conservative, suspects are
    # re-measure flags, not verdicts
    assert set(got) == {f"q{i:02d}" for i in range(20)}, got
    assert all(r >= 2.9 for r in got.values())


def test_bracketing_uses_nearest_probes_only():
    # contention strictly AFTER the last query of a segment must not
    # implicate earlier segments: only queries whose bracket includes
    # the hot probe flag
    marks = [(0, 0.15), (8, 0.15), (16, 0.60), (20, 0.15)]
    got = sentinel_suspects(marks, _names(20))
    # queries 8..15 are bracketed by probes at 8 (0.15) and 16 (0.60);
    # queries 16..19 by 16 (0.60) and 20 (0.15); queries 0..7 by clean
    # probes only
    assert set(got) == {f"q{i:02d}" for i in range(8, 20)}, got


def test_reference_is_robust_quiet_floor():
    # a session uniformly slow relative to nothing flags nothing (all
    # probes equal => every ratio is 1.0 — the absolute sentinel band in
    # BASELINE.md covers that mode)
    uniform = [(0, 0.45), (8, 0.45), (12, 0.45)]
    assert sentinel_suspects(uniform, _names(12)) == {}
    # a first probe 3x the steady state is contention, not JIT settling
    # (measured settling past the warm-up rounds is ~1.6x at worst)
    decay = [(0, 0.45), (8, 0.15), (12, 0.15)]
    got = sentinel_suspects(decay, _names(12))
    assert set(got) == {f"q{i:02d}" for i in range(8)}
    # one glitchy-fast sample must not drag the reference down: with the
    # raw min (0.05) every probe would read 3x+; the second-smallest
    # (0.15) keeps the quiet majority clean
    glitch = [(0, 0.15), (4, 0.05), (8, 0.16), (12, 0.15)]
    assert sentinel_suspects(glitch, _names(12)) == {}


def test_two_probe_series_falls_back_to_min_reference():
    # endpoints-only series (short sweep, or mid-sweep probes disabled):
    # the second-smallest would BE the larger probe and nothing could
    # ever flag — the reference falls back to the raw min so a 3x
    # contended endpoint still flags its segment (r10 review)
    got = sentinel_suspects([(0, 0.45), (4, 0.15)], _names(4))
    assert set(got) == {f"q{i:02d}" for i in range(4)}
    assert sentinel_suspects([(0, 0.15), (4, 0.16)], _names(4)) == {}


def test_threshold_boundary_and_empty_inputs():
    marks = [(0, 0.20), (4, 0.20), (8, 0.30)]  # 0.30/0.20 = 1.5, not >
    assert sentinel_suspects(marks, _names(8)) == {}
    marks = [(0, 0.20), (4, 0.20), (8, 0.302)]
    got = sentinel_suspects(marks, _names(8))
    assert set(got) == {f"q{i:02d}" for i in range(4, 8)}
    assert sentinel_suspects([], _names(4)) == {}
    assert sentinel_suspects([(0, 0.2)], []) == {}
    # a non-positive reference (clock glitch on the two smallest probes)
    # disables the rule rather than dividing by zero
    assert sentinel_suspects([(0, 0.0), (4, 0.0), (8, 0.2)], _names(8)) == {}


def test_settling_prefix_is_exempt_within_allowance():
    # the r10 quiet run whose probe settled 0.249 -> 0.115 ACROSS the
    # sweep (monotone within 5% tolerance for six probes): without the
    # settling exemption the first segment flags at 2.04x on a visibly
    # quiet session, collapsing the flag's precision
    marks = [
        (0, 0.249), (8, 0.172), (16, 0.131), (24, 0.135),
        (32, 0.137), (40, 0.122), (48, 0.115), (50, 0.133),
    ]
    assert sentinel_suspects(marks, _names(50)) == {}


def test_decaying_start_above_allowance_still_flags():
    # a 4x first probe fading monotonically is OUTSIDE the measured
    # settling envelope (SETTLING_ALLOWANCE x floor) — contention that
    # happens to be decaying, not JIT
    marks = [(0, 0.60), (8, 0.40), (16, 0.15), (20, 0.15)]
    got = sentinel_suspects(marks, _names(20))
    # probes 0 (4x) and 1 (2.7x) both exceed the allowance; every query
    # they bracket flags
    assert set(got) == {f"q{i:02d}" for i in range(16)}, got


def test_mid_sweep_bump_after_settling_prefix_flags():
    # the settling exemption must not shield a bump AFTER the decay:
    # the first increase ends the prefix
    marks = [(0, 0.24), (8, 0.17), (16, 0.45), (24, 0.15), (28, 0.15)]
    got = sentinel_suspects(marks, _names(28))
    # probe 2 (0.45) is past the prefix -> queries 8..23 flag; queries
    # 0..7 are bracketed by exempt probes only -> clean
    assert set(got) == {f"q{i:02d}" for i in range(8, 24)}, got


def test_ramping_load_is_not_settling():
    # ADVICE r10 (net-direction guard): each step of a slow RAMP is
    # within the 5% "non-increasing" tolerance, but the series RISES —
    # it must not be exempted as settling decay.  Here the load climbs
    # 0.20 -> 0.31 (every probe but the first exceeds 1.5x the 0.20
    # floor); without the guard the whole ramp was prefix-exempt and
    # nothing flagged.
    marks = [
        (0, 0.20), (8, 0.205), (16, 0.215), (24, 0.225),
        (32, 0.31), (36, 0.20),
    ]
    # second-smallest floor = 0.20; probe 4 (0.31) reads 1.55x
    got = sentinel_suspects(marks, _names(36))
    assert set(got) == {f"q{i:02d}" for i in range(24, 36)}, got


def test_jittery_genuine_decay_keeps_its_exemption():
    # the net-direction guard must not break the real settling shape: a
    # decay with one +4%-jitter step still ENDS below its start, so the
    # full prefix stays exempt (0.50/0.52 are 2.0/2.08x the 0.25 floor
    # — inside the allowance, previously green, must stay green)
    marks = [(0, 0.50), (8, 0.52), (16, 0.40), (24, 0.30), (28, 0.25)]
    assert sentinel_suspects(marks, _names(28)) == {}


def test_diffuse_contention_rule():
    # VERDICT r10 #7: the +10% whole-session drift that sails under the
    # per-segment rules.  Clean probes + total > 1.15x baseline sum =>
    # a diffuse record; suspect non-empty or total inside the band =>
    # None.
    base = {"a": 1.0, "b": 2.0, "c": 4.0}
    quiet = {"a": 1.05, "b": 2.1, "c": 4.2}          # 1.05x
    hot = {"a": 1.3, "b": 2.5, "c": 5.0}             # ~1.26x, no one query 2x
    assert diffuse_contention(quiet, base, {}) is None
    got = diffuse_contention(hot, base, {})
    assert got is not None and got["ratio"] == 1.26
    assert got["total_sec"] == 8.8 and got["baseline_sec"] == 7.0
    # the per-segment evidence is stronger — suspect suppresses diffuse
    assert diffuse_contention(hot, base, {"a": 1.8}) is None
    # unknown queries (no baseline row yet) are excluded on both sides
    got = diffuse_contention({**hot, "new_q": 9.9}, base, {})
    assert got is not None and got["total_sec"] == 8.8
    # exact threshold is not a breach; empty overlap disables the rule
    assert diffuse_contention({"a": 1.15}, {"a": 1.0}, {}) is None
    assert diffuse_contention({"zz": 1.0}, base, {}) is None
    assert diffuse_contention({}, base, {}) is None


def test_diffuse_retry_cures_a_contended_session():
    # VERDICT r12 #3: a synthetic host-contended sweep — every query
    # mildly inflated (the r12 signature), probes clean.  The retry
    # selects exactly the inflated set, the min-merge restores the
    # quiet-session record within noise, and the re-checked flag clears.
    base = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 0.5}
    quiet = {"a": 1.02, "b": 2.05, "c": 4.1, "d": 0.5}
    contended = {n: round(s * 1.3, 3) for n, s in quiet.items()}
    flag = diffuse_contention(contended, base, {})
    assert flag is not None and flag["ratio"] == 1.33  # 1.3 x the ~1.02x quiet
    # selection: everything above 1.15x its baseline; 'd' at 0.65 vs 0.5
    # is 1.3x so it is in too — a query already under the bar is not
    targets = inflated_queries(contended, base)
    assert targets == ["a", "b", "c", "d"]
    assert inflated_queries({"a": 1.1, "b": 9.9}, base) == ["b"]
    # queries with no baseline row (or a zero row) are never selected
    assert inflated_queries({"zz": 9.9}, base) == []
    assert inflated_queries({"a": 9.9}, {"a": 0.0}) == []
    # the retry lands at quiet speed; merge keeps the per-query MIN
    merged = merge_retry(contended, quiet)
    assert merged == quiet
    assert diffuse_contention(merged, base, {}) is None
    # a retry that reads WORSE never degrades the record
    worse = {n: s * 2 for n, s in contended.items()}
    assert merge_retry(contended, worse) == contended
    # still-loaded machine: partial relief keeps a residual (honest) flag
    half = {"a": 1.02, "b": 2.05}
    residual = merge_retry(contended, half)
    got = diffuse_contention(residual, base, {})
    assert got is not None and got["ratio"] < flag["ratio"]


def test_compact_record_fits_the_driver_tail_capture():
    # VERDICT r13 #1: the r13 record outgrew the driver's fixed-size
    # stdout tail (parsed: null).  Pin the compact line <= 4 KB on a
    # WORST-CASE record: 50 queries at the longest plausible name width
    # (the real registry max is 26 chars), 4-digit seconds, every flag
    # populated, a full retry.  The verbose evidence must live in the
    # detail line, not the driver-facing one.
    names = [f"olap_customer_distribution_{i:02d}" for i in range(50)]
    per_query = {n: 1234.567 for n in names}
    suspect = {n: 3.09 for n in names}
    outliers = {n: 2.47 for n in names}
    sentinel = {
        "first_sec": 0.492,
        "last_sec": 0.238,
        "drift": 0.48,
        "ref_sec": 0.159,
        "series": [[i * 8, 0.2] for i in range(8)],
    }
    retry_info = {
        "initial": {"ratio": 1.33, "total_sec": 99.9, "baseline_sec": 75.0},
        "retried": names,
        "retry_sec": {n: 1000.0 for n in names},
    }
    diffuse = {"ratio": 1.33, "total_sec": 99.9, "baseline_sec": 75.0}
    line, detail = compact_record(
        61728.35, per_query, 0.1, sentinel, outliers, suspect, diffuse,
        retry_info,
    )
    assert len(line.encode()) <= 4096, len(line.encode())
    assert "\n" not in line
    rec = json.loads(line)
    assert rec["metric"] == "wall_sec_total" and rec["value"] == 61728.35
    assert rec["queries"] == per_query and rec["sf"] == 0.1
    # compact flags only — counts/maxima, never the per-query maps
    assert rec["suspect_n"] == 50 and rec["suspect_max"] == 3.09
    assert rec["outlier_n"] == 50 and rec["retry_n"] == 50
    assert rec["diffuse"] == diffuse
    assert "series" not in rec["sentinel"] and rec["sentinel"]["drift"] == 0.48
    # the verbose evidence round-trips through the detail line
    det = json.loads(detail)
    assert det["suspect"] == suspect and det["outliers"] == outliers
    assert det["sentinel_series"] == sentinel["series"]
    assert det["diffuse_retry"]["retried"] == names
    # quiet-session shape: empty flags serialize to null/zero, not maps
    line2, _ = compact_record(
        30.0, per_query, 0.1, sentinel, {}, {}, None, None
    )
    rec2 = json.loads(line2)
    assert rec2["suspect_n"] == 0 and rec2["suspect_max"] is None
    assert rec2["diffuse"] is None and rec2["retry_n"] == 0
    assert len(line2.encode()) <= 4096


def test_baseline_rows_parses_the_real_table():
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE.md")
    rows = baseline_rows(path)
    # the real file: 50 registry rows, total/header rows skipped
    assert len(rows) == 50, sorted(rows)
    assert rows["q_speed"] == 0.31  # r15 re-record
    assert rows["ann_ivf_recall"] == 3.0  # r15 re-record
    assert "total" not in rows and "query" not in rows
    assert all(v > 0 for v in rows.values())
    # unreadable file degrades to {} (advisory rule, never breaks bench)
    assert baseline_rows("/nonexistent/BASELINE.md") == {}


def test_suspect_triggers_the_retry_pass():
    # r15 measurement fix: the r14 DRIVER record fired suspect on 48/50
    # queries (max 2.89x) and retried NOTHING — diffuse, the only retry
    # trigger, is suppressed whenever suspect is non-empty.  Both flags
    # now select the same inflated set for the median-of-3 re-run.
    from bench import retry_targets

    base = {"a": 1.0, "b": 2.0, "c": 4.0}
    contended = {"a": 1.4, "b": 2.1, "c": 5.6}
    # suspect non-empty, diffuse None (the r14 driver shape)
    assert retry_targets(contended, base, {"a": 2.89, "c": 1.54}, None) == [
        "a",
        "c",
    ]
    # diffuse alone still triggers (the r13 behavior, unchanged)
    flag = {"ratio": 1.3, "total_sec": 9.1, "baseline_sec": 7.0}
    assert retry_targets(contended, base, {}, flag) == ["a", "c"]
    # a clean session retries nothing
    assert retry_targets(contended, base, {}, None) == []
    # flags without baseline rows cannot select (advisory rule intact)
    assert retry_targets({"zz": 9.9}, {}, {"zz": 2.0}, None) == []
