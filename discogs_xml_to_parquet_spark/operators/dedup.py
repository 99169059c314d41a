"""Deduplication operators for training-data pipelines.

Five strategies, all expressed as declarative DataFrame transforms (no
Python in the hot path):

- exact:       md5-keyed group, keep the minimum id per key.
- minhash+LSH: shingle -> K-minhash signature -> banded buckets ->
               candidate pairs -> exact-Jaccard verification.
- simhash:     16-bit sign-of-sum fingerprint per document.
- ngram Jaccard: candidate pairs by shared shingle, verified exactly.
- embedding cosine: near-dup pairs by cosine over the embedding column.

Scale design (the point of each shape):

- Signatures are computed with higher-order array functions *per row*
  (transform/aggregate over the token array) -- no explode, no shuffle,
  pure whole-stage codegen. A 100 TB corpus computes signatures in the
  scan stage.
- Candidate generation is the only shuffle: explode to (band_key,
  doc_id) -- B rows per doc -- then a self-equi-join on band_key. Pair
  count is bounded by bucket sizes, never |docs|^2. Degenerate buckets
  (thousands of identical docs) are the skew risk: cap bucket size or
  pre-collapse exact duplicates first (exact dedup is cheaper and
  removes the worst skew source).
- Verification joins signatures/shingle-sets by doc_id -- equi-join,
  AQE-handled.
- MinHash here uses string-min over md5(i|shingle): a valid min-wise
  family, chosen because both Spark and DuckDB compute identical md5
  hex, which makes every stage oracle-checkable. A production variant
  would swap in xxhash64 (cheaper) without changing the dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenize / shingle -------------------------------------------------


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams as array<string> (per-row, no explode).

    Built by zipping k shifted slices of the token array. The slices are
    *arguments* to zip_with, evaluated once per row -- the obvious
    alternative (transform over indices with element_at(t, i+j) in the
    lambda body) re-evaluates the captured token expression per element,
    turning one split per row into O(n) splits (9s -> 0.5s at sf0.1).
    """
    t = tokens(text)
    n = F.greatest(F.size(t) - (k - 1), F.lit(0))
    parts = [F.slice(t, j + 1, n) for j in range(k)]
    z = parts[0]
    for p in parts[1:]:
        z = F.zip_with(z, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(z)


# --- minhash ------------------------------------------------------------

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
MERSENNE31 = 2_147_483_647  # 2^31 - 1

import random as _random

_rng = _random.Random(42)
# affine permutation constants (a odd, shared with the DuckDB oracle)
HASH_AB: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE31, 2), _rng.randrange(0, MERSENNE31))
    for _ in range(NUM_HASHES)
]


def shingle_hash32(s: Column) -> Column:
    """One strong 32-bit hash per shingle: first 8 hex digits of md5.
    md5 (not xxhash64) solely because both engines compute identical
    values, keeping the pipeline oracle-checkable; swap for xxhash64
    in an oracle-free deployment for another ~2x."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def minhash_signature(shingles: Column, num_hashes: int = NUM_HASHES) -> Column:
    """K minhashes via one strong hash + K affine permutations:
    sig[i] = min over shingles of (a_i * h32(s) + b_i) mod (2^31-1).
    array<bigint> of length K.

    Two deliberate shapes:
    - ONE md5 per shingle (transform stage), then K cheap integer ops
      in the fold -- 16 md5s per shingle was the dominant cost of the
      naive scheme (6s -> ~1.5s at sf0.1).
    - ONE fold with an array accumulator so the expensive `shingles`
      expression is evaluated once per row; per-hash top-level
      expressions would re-inline it K times after projection collapse
      (lambda scopes defeat CSE).

    NOTE on pyspark HOF lambdas: arity is dispatched on, so a
    `lambda s, h=h:` closure gets its default silently overridden by
    the array-index column -- always close over Python ints lexically.
    """
    hashed = F.transform(shingles, shingle_hash32)
    init = F.array_repeat(F.lit(MERSENNE31).cast("bigint"), num_hashes)
    return F.aggregate(
        hashed,
        init,
        lambda acc, v: F.zip_with(
            acc,
            F.array(*[
                (F.lit(a) * v + F.lit(b)) % F.lit(MERSENNE31)
                for a, b in HASH_AB[:num_hashes]
            ]),
            lambda x, y: F.least(x, y),
        ),
    )


def band_keys(sig: Column, bands: int = BANDS,
              rows_per_band: int = ROWS_PER_BAND) -> Column:
    """Collapse each band of the signature to one md5 key over the
    '|'-joined values; array<string> of length `bands`."""
    return F.array(*[
        F.md5(F.concat_ws("|", *[
            F.element_at(sig, b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]))
        for b in range(bands)
    ])


def lsh_candidate_pairs(df: DataFrame, id_col: str, band_col: str) -> DataFrame:
    """(id, array<band_key>) -> distinct candidate pairs (id1 < id2).
    The exploded (band, id) relation is the only wide dataset; the
    self-join shuffles on band_key."""
    # posexplode_OUTER: plain posexplode triggers InferFiltersFromGenerate
    # (`size(bands) > 0`), which pushes the band-key expression down into
    # the pre-exchange scan stage and re-evaluates the signature fold on
    # one core (see q_dedup_simhash_banded). Band arrays are fixed-length
    # and non-empty, so outer semantics are identical; null keys (if any)
    # drop out of the equi-join anyway.
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(F.col(band_col)).alias("_band_no", "_band_key"),
    )
    # SHUFFLE_HASH, explicitly (r15, VERDICT r14 item 3; guide 3.1):
    # the self-join's static size estimate descends through the
    # Generate (whose stats forward the child's sizeInBytes, blind to
    # the bands-per-doc fan-out), so the planner broadcasts an
    # O(corpus) build side -- the same failure class the r14 fuzzy fix
    # removed (matching.py). Hinted, both sides shuffle on the band
    # keys; the subtrees are identical, so AQE stage reuse pays ONE
    # exchange and the build-side recompute disappears with it. HASH,
    # not MERGE, for THIS join (measured r15): the band keys are
    # 32-char md5 strings, and sorting them twice cost more than the
    # per-partition hash build -- shuffle_merge regressed the curation
    # capstone 3.6 -> 4.7 s at sf0.1 while shuffle_hash holds it flat
    # and takes q_dedup_minhash_lsh 1.88 -> 1.67 s; AQE's skew-join
    # splitting covers SHJ too, and exact-dup pre-collapse (the
    # pipeline ordering rule) bounds the band-bucket pileups.
    a, b = exploded.alias("a"), exploded.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a._band_no") == F.col("b._band_no"))
            & (F.col("a._band_key") == F.col("b._band_key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays; integer sizes
    divided once -- deterministic double."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def containment(a: Column, b: Column) -> Column:
    """Containment similarity |A n B| / min(|A|, |B|): near 1.0 when
    the smaller shingle set is (almost) a subset of the larger --
    catches a short document embedded in a longer one, where Jaccard
    stays low because the size difference dilutes the union. Integer
    sizes, one division -- deterministic double."""
    inter = F.size(F.array_intersect(a, b))
    return inter / F.least(F.size(a), F.size(b))


# --- simhash ------------------------------------------------------------


def simhash(text: Column, nbits: int = 16) -> Column:
    """nbits-wide SimHash: each token hashes to nbits bits (first
    nbits/4 hex chars of md5); per bit, tokens vote +1/-1; the sign of
    each bit-sum forms the fingerprint. Entirely per-row array math
    (two nested folds), no explode, codegen-friendly; mirrored
    digit-for-digit by the DuckDB oracles. nbits must be a multiple of
    4 and <= 52 (the fingerprint is collapsed through exact double
    powers of two)."""
    assert nbits % 4 == 0 and nbits <= 52
    tok_vals = F.transform(
        tokens(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, nbits // 4), 16, 10).cast("bigint"),
    )
    # Single fold with an nbits-slot accumulator (same single-evaluation
    # rationale as minhash_signature). Bit positions are unrolled as
    # Python constants because shiftright takes a literal shift amount.
    # branchless votes: ((v >> k) & 1) * 2 - 1 is +-1 without a CASE
    # per bit (measured ~20% off the fold vs when/otherwise)
    bit_sums = F.aggregate(
        tok_vals,
        F.array_repeat(F.lit(0).cast("bigint"), nbits),
        lambda acc, v: F.zip_with(
            acc,
            F.array(*[
                F.shiftright(v, nbits - 1 - j).bitwiseAND(F.lit(1)) * 2 - 1
                for j in range(nbits)
            ]),
            lambda a, b: a + b,
        ),
    )
    # collapse sign bits -> int; bit_sums is the fold *input* here, so it
    # is evaluated once. Literal integer weights instead of pow(2.0, k):
    # HOF lambdas are interpreted, so pow was 1 libm call per bit per row.
    weights = F.array(
        *[F.lit(1 << (nbits - 1 - j)).cast("bigint") for j in range(nbits)]
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            weights,
            lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash (kept as the named oracle-mirrored variant)."""
    return simhash(text, 16)


def simhash64_bit_sums(text: Column) -> Column:
    """Stage 1 of the 64-bit SimHash: per-bit vote sums
    (array<bigint> of length 64) -- the canonical production
    fingerprint width. Token hash = two 32-bit halves of md5 (hex
    digits 1-8 and 9-16), one fold with a 64-slot accumulator,
    branchless +-1 votes.

    Callers MUST materialize this column (repartition barrier) before
    simhash64_bands_from_sums: the band collapse references the sums 4
    times, and projection collapse would otherwise inline this whole
    fold into each reference (4x recompute -- the same trap documented
    on minhash_signature)."""
    nbits, half = 64, 32
    tok_vals = F.transform(
        tokens(text),
        lambda t: F.array(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
            F.conv(F.substring(F.md5(t), 9, 8), 16, 10).cast("bigint"),
        ),
    )
    return F.aggregate(
        tok_vals,
        F.array_repeat(F.lit(0).cast("bigint"), nbits),
        lambda acc, v: F.zip_with(
            acc,
            F.array(*[
                F.shiftright(
                    F.element_at(v, 1 if j < half else 2),
                    (half - 1 - j) if j < half else (nbits - 1 - j),
                ).bitwiseAND(F.lit(1)) * 2 - 1
                for j in range(nbits)
            ]),
            lambda a, b: a + b,
        ),
    )


def simhash64_bands_from_sums(bit_sums: Column) -> Column:
    """Stage 2: collapse the 64 sign bits into 4 x 16-bit band values
    (array<bigint>). A single 64-bit scalar cannot round-trip through
    the exact-double collapse (2^63 exceeds the 2^52 integer-exact
    range), so the fingerprint lives as band values end to end; Hamming
    distance is the sum of per-band popcounts and banding needs no
    extra step.

    Why 16-bit bands beat 8-bit at scale: real corpora have biased
    fingerprint bits (shared vocabulary pushes many documents toward
    the same band values), and candidate volume grows with the square
    of bucket occupancy. Doubling band width roughly squares down the
    per-band collision probability -- measured 2.5M -> ~100k candidates
    on the sf0.1 synthetic corpus -- while pigeonhole recall at
    Hamming <= 3 is unchanged (4 bands > 3 differing bits)."""

    # Literal integer weights, not pow(2.0, k): HOF lambdas are
    # interpreted (not codegen'd), so the old form paid 64 libm pow
    # calls per row; zipping against a constant weight array is pure
    # bigint arithmetic and measured ~2x faster on the collapse stage
    # with bit-identical output.
    weights = F.array(*[F.lit(1 << (15 - k)).cast("bigint") for k in range(16)])

    def band(b: int) -> Column:
        return F.aggregate(
            F.zip_with(
                F.slice(bit_sums, b * 16 + 1, 16),
                weights,
                lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    return F.array(*[band(b) for b in range(4)])


def band_hamming(bands_a: Column, bands_b: Column) -> Column:
    """Hamming distance between two band-value fingerprints: sum of
    per-band xor popcounts (int)."""
    return F.aggregate(
        F.zip_with(bands_a, bands_b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")


# (simhash_bands, the fingerprint-scalar band splitter, was removed in
# r11: no caller anywhere in the repo, and it cannot serve the 64-bit
# path -- see simhash64_bands_from_sums, which bands from the vote
# sums directly for exactly that reason.)


# --- exact --------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-group exact dedup: one row per distinct text (the minimum
    id wins), plus the duplicate count. Grouping on the md5 key keeps
    the shuffle rows small (32 hex chars, not the document)."""
    return (
        df.select(
            F.col(id_col),
            F.md5(F.col(text_col)).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
