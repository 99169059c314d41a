"""Exactness of the set-similarity join on ADVERSARIAL corpora the
bench tables don't contain (the r11 distinct-set collapse touches
every stage, so its algebra is pinned beyond the template corpus):
threshold-boundary pairs, subset chains, identical-set cliques,
high-df shared tokens, and zero-token documents. Expected output is
a brute-force pure-Python Jaccard over the same tokenization."""

from __future__ import annotations

import itertools
import random
import re

import pytest

from discogs_xml_to_parquet_spark.queries.setsim import (
    _T_DEN,
    _T_NUM,
    setsim_pairs,
)


def _tokens(text: str) -> frozenset[str]:
    return frozenset(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)


def _expected(docs: list[tuple[int, str]]) -> list[tuple[int, int, int, int]]:
    toks = {i: _tokens(t) for i, t in docs}
    out = []
    for (ia, ta), (ib, tb) in itertools.combinations(
            sorted(toks.items()), 2):
        if not ta or not tb:
            continue  # zero-token docs share nothing
        i = len(ta & tb)
        u = len(ta | tb)
        if i * _T_DEN >= _T_NUM * u:
            out.append((ia, ib, i, u))
    return sorted(out)


def _run(spark, docs: list[tuple[int, str]]):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
        for r in setsim_pairs(df).collect()
    )
    assert got == _expected(docs), (got, _expected(docs))
    return got


def test_threshold_boundary_pairs(spark):
    """Pairs engineered to sit exactly ON and just OFF the 19/20
    threshold: 19 shared + 1 extra = J 19/20 (in), 19 shared + 2
    extra = 19/21 (out), 20 shared + 1 extra = 20/21 (in)."""
    base19 = " ".join(f"tok{i}" for i in range(19))
    base20 = " ".join(f"tok{i}" for i in range(20))
    docs = [
        (1, base19),                      # 19 tokens
        (2, base19 + " extraA"),          # 19/20 with 1 -> IN
        (3, base19 + " extraA extraB"),   # vs 1: 19/21 OUT; vs 2: 20/21 IN
        (4, base20 + " extraC"),          # vs 5 below
        (5, base20),                      # 20/21 with 4 -> IN
    ]
    got = _run(spark, docs)
    assert (1, 2, 19, 20) in got
    assert (2, 3, 20, 21) in got
    assert not any(p[:2] == (1, 3) for p in got)
    assert (4, 5, 20, 21) in got


def test_identical_set_cliques_expand_fully(spark):
    """A clique of docs with the SAME token set (different order /
    multiplicity / separators) must emit all C(m,2) pairs with
    n_common = n_union = |set| -- the intra-clique expansion path."""
    docs = [
        (10, "alpha beta gamma delta"),
        (11, "delta gamma beta alpha"),
        (12, "alpha, ALPHA; beta beta gamma---delta"),
        (13, "beta gamma alpha delta delta"),
        (20, "something else entirely here"),
    ]
    got = _run(spark, docs)
    clique = [p for p in got if p[0] >= 10 and p[1] <= 13]
    assert len(clique) == 6  # C(4,2)
    assert all(p[2:] == (4, 4) for p in clique)


def test_subset_chain_across_cliques(spark):
    """Cross-clique qualifying pairs where one clique's set is a
    1-token superset of another's (the only way non-identical small
    sets qualify at t=0.95): every member of clique A pairs with
    every member of clique B."""
    small = " ".join(f"w{i}" for i in range(19))
    big = small + " extra"
    docs = [(1, small), (2, small), (3, big), (4, big)]
    got = _run(spark, docs)
    cross = [p for p in got if p[2:] == (19, 20)]
    assert sorted(p[:2] for p in cross) == [(1, 3), (1, 4), (2, 3), (2, 4)]
    intra = [p for p in got if p[:2] in ((1, 2), (3, 4))]
    assert len(intra) == 2


def test_zero_token_docs_never_pair(spark):
    docs = [(1, "---"), (2, ""), (3, "!!!"), (4, "real words here " * 7)]
    assert _run(spark, docs) == []


def test_randomized_corpus_matches_bruteforce(spark):
    """Seeded random corpus over a small alphabet with heavy overlap
    (many near-identical sets, shared rare tokens -- the regime where
    both the prefix theorem and the collapse algebra must hold)."""
    rng = random.Random(11)
    vocab = [f"v{i}" for i in range(30)]
    docs = []
    for i in range(60):
        if i % 3 == 0 and docs:
            # perturb an earlier doc: drop or add one token
            base = _tokens(docs[rng.randrange(len(docs))][1])
            s = set(base)
            if rng.random() < 0.5 and len(s) > 1:
                s.discard(rng.choice(sorted(s)))
            else:
                s.add(rng.choice(vocab))
            docs.append((i, " ".join(sorted(s))))
        else:
            k = rng.randint(15, 25)
            docs.append((i, " ".join(rng.sample(vocab, k))))
    _run(spark, docs)


@pytest.mark.parametrize("seed", [1, 2])
def test_randomized_exact_duplicate_heavy(spark, seed):
    """Corpora that are mostly exact-duplicate cliques -- the shape
    the collapse exists for; output must still be the brute force."""
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(25)]
    protos = [" ".join(sorted(rng.sample(vocab, rng.randint(18, 22))))
              for _ in range(5)]
    docs = [(i, protos[rng.randrange(5)]) for i in range(40)]
    _run(spark, docs)
