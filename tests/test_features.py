"""Invariant tests for features.py + q_inverted_index: recompute each
definition in plain Python at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE

registry.load_all_queries()


def _lower_median(vals):
    vals = sorted(vals)
    return vals[(len(vals) + 1) // 2 - 1]


def test_mad_matches_python(spark):
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    by_g = defaultdict(list)
    for r in rows:
        by_g[r["l_returnflag"]].append(r["l_extendedprice"])
    expect = {}
    for g, vals in by_g.items():
        med = _lower_median(vals)
        mad = _lower_median([abs(v - med) for v in vals])
        expect[g] = (med, mad)
    out = registry.QUERIES["q_stats_mad"](spark, SF_SMOKE).collect()
    got = {r["l_returnflag"]: (r["median_price"], r["mad_price"]) for r in out}
    assert got == expect
    assert all(mad > 0 for _, mad in got.values())


def test_feature_normalize_matches_python(spark):
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    ).collect()
    by_g = defaultdict(list)
    for r in rows:
        p100 = math.floor(r["l_extendedprice"] * 100.0 + 0.5)
        by_g[r["l_returnflag"]].append((r["l_orderkey"], r["l_linenumber"], p100))
    expect = {}
    for g, items in by_g.items():
        n = len(items)
        sp = sum(p for _, _, p in items)
        spp = sum(p * p for _, _, p in items)
        # fold through doubles in the ENGINE's operation order (each
        # input cast to double first, n*spp - sp*sp in double space):
        # Python's float ops are the same correctly-rounded IEEE, so
        # this mirror is bit-identical, not merely close
        fn, fsp, fspp = float(n), float(sp), float(spp)
        for ok, ln, p in items:
            z = (float(p) - fsp / fn) / math.sqrt(fn * fspp - fsp * fsp) * fn
            # (l_orderkey, l_linenumber) is NOT unique in the synthetic
            # lineitem, so compare as a multiset of full rows
            expect[(ok, ln, g, z)] = expect.get((ok, ln, g, z), 0) + 1
    out = registry.QUERIES["q_feature_normalize"](spark, SF_SMOKE).collect()
    got: dict = {}
    for r in out:
        k = (r["l_orderkey"], r["l_linenumber"], r["l_returnflag"], r["z_price"])
        got[k] = got.get(k, 0) + 1
    assert got == expect  # bit-identical z (same IEEE op order)
    # z-scores must straddle zero
    zs = [k[3] for k in got]
    assert any(z > 0 for z in zs) and any(z < 0 for z in zs)


def test_inverted_index_definition(spark):
    rows = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    import re

    posting = defaultdict(set)
    for r in rows:
        for t in re.split(r"[^a-z]+", r["text"].lower()):
            if len(t) >= 4:
                posting[t].add(r["doc_id"])
    out = registry.QUERIES["q_inverted_index"](spark, SF_SMOKE).collect()
    got = {r["token"]: (r["df"], r["postings"]) for r in out}
    assert set(got) == set(posting)
    capped_any = False
    for t, docs in posting.items():
        df, posts = got[t]
        assert df == len(docs)
        expect_posts = " ".join(str(d) for d in sorted(docs)[:16])
        assert posts == expect_posts
        capped_any |= len(docs) > 16
    assert capped_any  # the cap actually binds somewhere
