"""Invariant tests for the curation_extra operators: each recomputes
the operator's DEFINITION in plain Python/numpy at sf0.001 and checks
the Spark result against it (the oracle proves Spark==DuckDB; these
prove both equal the definition)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE

registry.load_all_queries()

_CH = 4


def _doc_tokens(spark):
    rows = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: [t for t in r["text"].split() if t] for r in rows}


def test_chunk_dedup_first_occurrence(spark):
    """Greedy sweep in (doc_id, chunk_no) order: a chunk text survives
    iff it has not been seen before, and dedup_text is the in-order
    join of the survivors."""
    toks = _doc_tokens(spark)
    seen: set[str] = set()
    expect: dict[int, tuple[int, int, str]] = {}
    for doc_id in sorted(toks):
        tk = toks[doc_id]
        if not tk:
            continue
        kept_texts = []
        n_chunks = 0
        for s in range(0, len(tk), _CH):
            n_chunks += 1
            text = " ".join(tk[s : s + _CH])
            if text not in seen:
                seen.add(text)
                kept_texts.append(text)
        expect[doc_id] = (n_chunks, len(kept_texts), " ".join(kept_texts))
    out = registry.QUERIES["q_dedup_chunks"](spark, SF_SMOKE).collect()
    assert {r["doc_id"] for r in out} == set(expect)
    dropped_total = 0
    for r in out:
        n_chunks, n_kept, text = expect[r["doc_id"]]
        assert r["n_chunks"] == n_chunks
        assert r["n_kept"] == n_kept
        assert r["n_dropped"] == n_chunks - n_kept
        assert r["dedup_text"] == text
        dropped_total += r["n_dropped"]
    assert dropped_total > 0  # non-vacuous: the corpus has dup chunks


def test_budget_select_is_greedy_prefix(spark):
    """The selected docs are exactly the maximal quality-ordered prefix
    whose token sum fits floor(total/4), and cum_tokens is its running
    sum."""
    toks = _doc_tokens(spark)
    stats = [
        (
            len(set(tk)) * 1_000_000 // len(tk),
            doc_id,
            len(tk),
        )
        for doc_id, tk in toks.items()
        if tk
    ]
    budget = sum(n for _, _, n in stats) // 4
    stats.sort(key=lambda s: (-s[0], s[1]))
    expect = {}
    cum = 0
    for qual, doc_id, n in stats:
        cum += n
        if cum > budget:
            break
        expect[doc_id] = (qual, n, cum)
    out = registry.QUERIES["q_budget_select"](spark, SF_SMOKE).collect()
    got = {r["doc_id"]: (r["quality_ppm"], r["n_tokens"], r["cum_tokens"]) for r in out}
    assert got == expect
    assert 0 < len(got) < len(stats)  # budget bites but keeps something


def test_semantic_dedup_matches_numpy(spark):
    """kept == False iff some LOWER-id vector in the same cluster has
    cosine >= 0.40 with it; cluster = argmin squared-L2 to the first-8
    centroids (ties to the lower centroid id)."""
    rows = (
        load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    vs = np.array([r["v"] for r in rows])[order]
    cents = vs[ids < 8]
    d2 = ((vs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)  # argmin takes the first max tie -> lower cid
    nrm = np.sqrt((vs * vs).sum(axis=1))
    cos = (vs @ vs.T) / np.outer(nrm, nrm)
    expect = {}
    for i, vid in enumerate(ids):
        same = (cluster == cluster[i]) & (ids < vid)
        expect[int(vid)] = (int(cluster[i]), not bool((cos[i, same] >= 0.40).any()))
    out = registry.QUERIES["q_dedup_semantic"](spark, SF_SMOKE).collect()
    got = {r["vec_id"]: (r["cluster_id"], r["kept"]) for r in out}
    assert got == expect
    assert any(not kept for _, kept in got.values())  # non-vacuous
