"""bench.py's stdout contract: the line the driver records must fit
its 2000-char tail cap WHOLE, keep the contract keys, and degrade by
the documented trim ladder -- the r1-r8 artifacts all hold mid-line
truncated tails because this line had silently grown past the cap."""

from __future__ import annotations

import json

from bench import _LINE_BUDGET, compact_line


def _full(n_queries: int, n_sf1: int = 12, name_len: int = 16) -> dict:
    qs = {f"q_{i:03d}_".ljust(name_len, "x"): 1.234 + i / 997
          for i in range(n_queries)}
    return {
        "metric": "headline_query_wall_sec",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "n": 5,
        "sf": "0.1",
        "cpu_attribution": {
            "eff_cores": [6.9, 7.1, 5.2], "os_cpus": 32, "cpus": 32,
            "spin_sec": [0.112, 0.109, 0.115],
            "busy_frac": [0.21, 0.22, 0.19],
        },
        "filtered": {
            "value": round(sum(qs.values()), 3),
            "clean_passes": [0, 1, 2],
            "queries": dict(qs),
        },
        "conversion": {"rows": 1000000, "rows_per_sec": 131822,
                       "eff_cores": [10.1, 9.9, 10.2]},
        "conversion_scaleout": {"rows": 1000000, "rows_per_sec": 241721,
                                "eff_cores": [27.4, 27.3, 27.5]},
        "longtail": {"round": 9, "queries": {
            f"q_lt_{i}": 0.5 for i in range(5)}},
        "sf1_spot": {
            "sf": 1.0,
            "queries": {f"q_sf1_{i:02d}x": 12.345 for i in range(n_sf1)},
            "passes": 3, "over_budget": False,
            "eff_cores": [17.0, 16.5, 18.2],
            "spin_sec": [0.113, 0.118, 0.111],
        },
    }


def test_current_shape_fits_with_all_sections():
    """Today's real shape (~31 headline queries, 12 sf1, 5 longtail)
    must fit WITHOUT any trimming."""
    line = compact_line(_full(31))
    assert len(line) <= _LINE_BUDGET
    d = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d
    assert d["longtail"] and d["sf1"]["queries"]  # nothing trimmed
    assert "queries_omitted" not in d
    # the contamination-filtered headline rides next to the raw one
    assert d["value_filtered"] == d["value"]
    assert d["clean_passes"] == [0, 1, 2]


def test_trim_ladder_drops_ballast_before_queries():
    """At ~2x growth the ballast goes (longtail, precision, per-query
    sf1) while every headline median survives."""
    line = compact_line(_full(60, n_sf1=20))
    assert len(line) <= _LINE_BUDGET
    d = json.loads(line)
    assert "longtail" not in d
    assert len(d["queries"]) == 60  # every query still present (1-dp)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d
    assert d["sf1"]["passes"] == 3  # lane summary survives trims


def test_budget_holds_under_extreme_growth_with_explicit_omission():
    """The last-resort cap is EXPLICIT, never silent: kept slowest-K
    plus a queries_omitted count that accounts for every query."""
    line = compact_line(_full(300, n_sf1=40, name_len=30))
    assert len(line) <= _LINE_BUDGET
    d = json.loads(line)
    assert d["queries_omitted"] + len(d["queries"]) == 300
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d


def test_no_sf1_lane_is_allowed():
    full = _full(31)
    full["sf1_spot"] = None
    d = json.loads(compact_line(full))
    assert d["sf1"] is None


def test_clean_pass_filter_excludes_contaminated_passes():
    """The r11 driver artifact's shape (passes 4-5: spin +25%, busy
    fraction doubled) must be excluded; ordinary jitter must not be;
    and the reference pass itself always qualifies."""
    from bench import _clean_pass_filter

    spins = [0.122, 0.124, 0.131, 0.160, 0.155]
    busy = [0.15, 0.15, 0.18, 0.31, 0.33]
    assert _clean_pass_filter(spins, busy) == [0, 1, 2]
    # a quiet box: every pass clean
    assert _clean_pass_filter(
        [0.11, 0.112, 0.109], [0.2, 0.21, 0.2]) == [0, 1, 2]
    # pathological: only the cleanest pass survives, never empty
    assert _clean_pass_filter(
        [0.1, 0.2, 0.3], [0.1, 0.4, 0.6]) == [0]


def test_clean_pass_filter_split_minima_never_empty():
    """ADVICE r12: min-spin and min-busy on DIFFERENT passes, with
    neither satisfying both tolerances, used to return [] and crash
    the headline median. The fallback keeps the argmin-spin pass."""
    from bench import _clean_pass_filter

    # pass 0: fastest clock but a co-tenant burning cores (busy 0.5
    # vs quietest 0.1); pass 1: quiet box but clock throttled (spin
    # 2x the reference). No pass passes both gates.
    spins = [0.10, 0.20]
    busy = [0.50, 0.10]
    assert _clean_pass_filter(spins, busy) == [0]
    # three-pass variant: the two contaminated extremes plus a middle
    # pass failing both gates; still the argmin-spin pass survives
    assert _clean_pass_filter(
        [0.10, 0.15, 0.20], [0.50, 0.30, 0.10]) == [0]


def _sf10_block() -> dict:
    qs = ["q_fuzzy_blocked", "q_setsim_prefix_join",
          "q_pagerank_bipartite", "q_stats_mad", "q_merge_upsert"]
    return {
        "decade1_x": {n: 3.28 for n in qs},
        "decade2_x": {n: 4.12 for n in qs},
        "compound_x": {n: 1.26 for n in qs},
        "passes": 2,
        "recorded": True,
    }


def test_sf10_block_rides_and_trims_before_sf1_queries():
    """With an embedded sf10 record the line still fits; the trim
    order sacrifices longtail and sf10's re-derivable compound_x
    BEFORE the sf1 per-query medians, and decade2_x -- the second
    decade's new evidence -- survives every trim short of the
    terminal fallback."""
    full = _full(31)
    full["sf10_spot"] = _sf10_block()
    line = compact_line(full)
    assert len(line) <= _LINE_BUDGET
    d = json.loads(line)
    assert d["sf10"]["decade2_x"]
    assert d["sf10"]["recorded"] is True
    # grown shape: the whole sf10 block is sacrificed before any
    # headline median is omitted (the record file keeps the curve)
    full = _full(60, n_sf1=20)
    full["sf10_spot"] = _sf10_block()
    d = json.loads(compact_line(full))
    assert len(d["queries"]) == 60
    assert "queries_omitted" not in d


def test_no_sf10_record_omits_the_key():
    d = json.loads(compact_line(_full(31)))
    assert "sf10" not in d


def test_clean_pass_filter_singleton_fast_spin_keeps_the_cluster():
    """r13: the first record run measured one anomalously FAST spin
    (0.0825 s turbo window) against a uniform 0.098-0.110 cluster with
    uniform walls and busy -- min-as-reference disqualified four
    ordinary passes and left the filtered headline on one sample. The
    singleton guard retries with the second-smallest reference when
    the min corroborates nobody, and the agreeing cluster outvotes
    the singleton: all five passes qualify."""
    from bench import _clean_pass_filter

    spins = [0.1096, 0.098, 0.1013, 0.103, 0.0825]
    busy = [0.205, 0.221, 0.235, 0.225, 0.227]
    assert _clean_pass_filter(spins, busy) == [0, 1, 2, 3, 4]
    # ...while two AGREEING fast samples keep the min reference (a
    # real fast-clock window), excluding the genuinely slow tail
    spins2 = [0.083, 0.085, 0.102, 0.104, 0.110]
    assert _clean_pass_filter(spins2, busy) == [0, 1]
    # ...and a spread with NO cluster (every pass far from every
    # other) still collapses to the single cleanest pass, not two
    assert _clean_pass_filter(
        [0.1, 0.2, 0.3], [0.1, 0.4, 0.6]) == [0]
