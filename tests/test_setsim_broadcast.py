"""Size-conditional broadcasts in the set-similarity join (VERDICT
r11 item 1): the verification / expansion build sides -- the
distinct-set table with its token arrays, the doc-level membership
table -- are O(corpus), so their broadcast hints must be GATED on the
collapsed counts. Below _BROADCAST_MAX_ROWS the hint holds (the
candidate pairs never shuffle); above it the same joins must plan as
shuffle joins with NO forced broadcast -- the plan that survives a
low-duplication 100 TB corpus where distinct sets ~= documents.

Both directions are pinned with spark.sql.autoBroadcastJoinThreshold
= -1, so a BroadcastHashJoin in the plan can only come from a hint
(and a missing hint cannot be masked by the size estimator)."""

from __future__ import annotations

from contextlib import contextmanager

from discogs_xml_to_parquet_spark.queries.setsim import setsim_pairs
from tests.test_plans import plan_of
from tests.test_setsim_corpora import _expected


@contextmanager
def _no_auto_broadcast(spark):
    """Disable size-estimated broadcasts so the only possible
    BroadcastHashJoin source is an explicit hint."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _corpus() -> list[tuple[int, str]]:
    """Every pipeline stage populated: an identical-set clique (intra
    expansion), a qualifying near-dup pair (candidate -> verification
    -> cross expansion), a rejected candidate, and distinct filler
    sets that keep the collapsed count well above a zero threshold."""
    base = " ".join(f"tok{i}" for i in range(19))
    docs = [
        (1, base + " extraA"),
        (2, base + " extraA"),            # clique with 1
        (3, base + " extraB"),            # J = 19/21 vs 1 -> rejected
        (4, base),                        # J = 19/20 vs 1 -> qualifies
    ]
    docs += [
        (10 + i, f"filler{i}a filler{i}b filler{i}c") for i in range(8)
    ]
    return docs


def test_above_threshold_plans_shuffle_join(spark):
    """broadcast_max_rows=0 models the 100 TB regime (every build
    side over the cap): the plan must contain NO BroadcastHashJoin
    anywhere, and the result must still be exact."""
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with _no_auto_broadcast(spark):
        out = setsim_pairs(df, broadcast_max_rows=0)
        plan = plan_of(out)
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        # the joins still happen -- as shuffle joins
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        got = sorted(
            (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
            for r in out.collect()
        )
    assert got == _expected(docs), (got, _expected(docs))


def test_below_threshold_keeps_broadcast_hint(spark):
    """Under the cap the hint must survive even with the size
    estimator disabled (threshold -1): the candidate/expansion joins
    plan as BroadcastHashJoin because the code ASKED for it, which is
    what keeps the big side shuffle-free at bench scale."""
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    with _no_auto_broadcast(spark):
        plan = plan_of(setsim_pairs(df))
        assert "BroadcastHashJoin" in plan, plan


def test_paths_agree_on_values(spark):
    """The two physical strategies compute the same relation: forced
    shuffle-join output == default (broadcast-hinted) output on a
    corpus exercising clique, cross, and rejected candidates."""
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")

    def rows(frame):
        return sorted(
            (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
            for r in frame.collect()
        )

    assert rows(setsim_pairs(df, broadcast_max_rows=0)) == rows(
        setsim_pairs(df))


def test_gate_counts_sets_and_docs_separately(spark):
    """The two caps gate independently: a threshold between the
    distinct-set count and the doc count must broadcast the set table
    (under) while the membership table (over) shuffles. The clique
    collapses 12 docs to 11 sets, so threshold 11 splits them."""
    docs = _corpus()
    n_docs = len(docs)                      # 12
    n_sets = len({frozenset(t.split()) for _, t in docs})  # 11
    assert n_sets < n_docs
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with _no_auto_broadcast(spark):
        plan = plan_of(setsim_pairs(df, broadcast_max_rows=n_sets))
        assert "BroadcastHashJoin" in plan, plan      # set-table joins
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            plan)                                     # membership joins


def test_byte_gate_blocks_wide_documents(spark):
    """VERDICT r12 item 3: the ROW cap is corpus-width blind -- a
    few WIDE documents (huge token arrays) sail under any row
    threshold while their broadcast build weighs arbitrarily much.
    This corpus passes the default 2M-row gate by 5 orders of
    magnitude, but its measured build-side bytes exceed a 256-byte
    cap (the token arrays alone weigh ~40 KiB; even the narrow
    membership table measures ~450 B), so NO broadcast may appear;
    the same corpus under the default byte cap must still broadcast
    (the gate measures, not disables)."""
    wide = [
        (i, " ".join(f"w{i}t{j}" for j in range(200)))
        for i in range(6)
    ]
    # a qualifying wide pair so the output is non-trivial: doc 7
    # shares doc 0's 200 tokens plus 10 extras -> J = 200/210 < 19/20
    # (rejected) and doc 8 = doc 0 plus 1 extra -> 200/201 >= 19/20
    wide.append((7, wide[0][1] + " " + " ".join(
        f"x{j}" for j in range(10))))
    wide.append((8, wide[0][1] + " extraZ"))
    df = spark.createDataFrame(wide, "doc_id long, text string")
    with _no_auto_broadcast(spark):
        capped = setsim_pairs(df, broadcast_max_bytes=256)
        plan = plan_of(capped)
        assert "BroadcastHashJoin" not in plan, plan
        assert "BroadcastExchange" not in plan, plan
        default_plan = plan_of(setsim_pairs(df))
        assert "BroadcastHashJoin" in default_plan, default_plan

        def rows(frame):
            return sorted(
                (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
                for r in frame.collect()
            )

        got = rows(capped)
        assert got == rows(setsim_pairs(df))
        assert got == _expected(wide), (got, _expected(wide))


def test_zero_threshold_handles_empty_corpus(spark):
    """The count()-based gate must not break the zero-token/empty
    degenerate path."""
    df = spark.createDataFrame(
        [(1, "...!"), (2, "")], "doc_id long, text string")
    assert setsim_pairs(df, broadcast_max_rows=0).count() == 0


def test_default_cap_matches_documented_constant(spark):
    """The production default is the documented 2M-row ceiling, not
    an accidental 0/None -- a regression here silently flips every
    bench-scale plan to shuffle joins."""
    from discogs_xml_to_parquet_spark.queries import setsim

    assert setsim._BROADCAST_MAX_ROWS == 2_000_000
    assert setsim._BROADCAST_MAX_BYTES == 512 * 2**20
    import inspect

    sig = inspect.signature(setsim_pairs)
    assert (sig.parameters["broadcast_max_rows"].default
            == setsim._BROADCAST_MAX_ROWS)
    assert (sig.parameters["broadcast_max_bytes"].default
            == setsim._BROADCAST_MAX_BYTES)
