"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "spread": {name: [min, max]}, "n": runs,
"sf": ...}.

Each query is executed via a count-style action that forces full
evaluation without collecting results to the driver. Per-query numbers
are MEDIANS of N_RUNS interleaved passes (r4 verdict item 3: single-shot
timings made 1.2-1.3x sandbox drift indistinguishable from real
regressions); the warmup pass is excluded from the numbers, and passes
are interleaved round-robin (all queries per pass, not all passes per
query) so slow drift cancels instead of biasing one query."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.session import get_spark

# Headline set: one per major operator family.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "q18_large_volume",
    "q_join_star_revenue",
    "q_filter_project",
    "q_sort_limit_topk",
    "q_window_topk_per_group",
    "q_agg_rollup",
    "q_explode_wordcount",
    "q_json_funcs",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce_topk",
    "q_asof_join",
    "q_stream_tumbling",
    "q_text_stats",
    # round-2 scale paths (VERDICT r1 item 8): the banded/blocked/bucketed
    # replacements for the three deliberately-quadratic baselines -- kept
    # in the headline set so their cost is tracked at every SF
    "q_dedup_simhash_banded",
    "q_fuzzy_blocked",
    "q_dedup_embedding_lsh",
    # round-3 curation additions: decontamination, quality filtering,
    # and the k-means update (broadcast-assign + scaled-exact means)
    "q_decontaminate_ngram",
    "q_quality_gopher_filter",
    "q_kmeans_update",
    # the flagship: the whole curation path (filter -> LSH dedup ->
    # components -> shuffle -> pack) as one plan; the most expensive
    # headline entry by design -- its cost is the engine's headline
    "q_curation_pipeline",
    # round-5 family additions: event-stream sessionization, exact
    # fixed-point statistics, and iterative graph (3-round PageRank,
    # the join+agg-per-round shape whose cost is round-dominated)
    "q_sessionize_events",
    "q_stats_moments",
    "q_pagerank_bipartite",
    # round-5 late families: CDC changelog compaction (one key shuffle),
    # the BPE tokenizer-training count step (corpus collapsed to the
    # word-frequency domain), and int8 embedding quantization (map-only
    # HOF rewrite pass)
    "q_cdc_apply",
    "q_bpe_pair_counts",
    "q_embedding_quantize",
    # round-9: the Q7 dual-role star (single fact-fact shuffle) -- in
    # the headline set so its sf1_spot entry gets a vs_headline_x
    # ratio (VERDICT r8 item 5 asks the 10x cost model be pinned)
    "q7_volume_shipping",
]


# The five most expensive headline queries (r6 plan audit): iterative
# graph, the curation capstone, fused fuzzy blocking, and the two
# banded dedups -- the plans whose scaling behavior carries the 100x
# claim.
SF1_QUERIES = [
    "q_pagerank_bipartite",
    "q_curation_pipeline",
    "q_fuzzy_blocked",
    "q_dedup_simhash_banded",
    "q_dedup_minhash_lsh",
    # VERDICT r7 item 4: one prefix-scan rewrite timed at 10x, so the
    # two-exchange plan's domain/P cost model is pinned by data (its
    # correctness at 10x is already pinned by scripts/sf1_verify.py)
    "q_stats_mad",
    # VERDICT r8 item 5: the only new-TPC-H shape with a fact-fact
    # shuffle -- a 10x timing pins that broadcast-reducing both nation
    # roles holds the single-shuffle cost model at scale
    "q7_volume_shipping",
    # VERDICT r9 item 3: the exact-Jaccard prefix join is the one r9
    # operator whose candidate space could grow superlinearly on the
    # near-duplicate template corpus (docstring admits 1.3x pruning) --
    # a 10x wall ratio pins whether candidates stay subquadratic; and
    # the IVM refresh's O(delta)+O(MV) cost model deserves a measured
    # ~flat 10x pair like MAD/CMS got (its 10x correctness is already
    # in scripts/sf1_verify.py DEFAULT)
    "q_setsim_prefix_join",
    "q_incremental_rollup",
    # VERDICT r10 item 5: the table-format lanes' docstring numbers
    # (COW-vs-rewrite I/O, pruned-vs-full diff rows, MV-vs-fact
    # rollup) become reproducible artifact facts -- merge/diff are
    # O(affected)+O(delta), so their 10x wall should be well under
    # 10x; the sketch rollup reads only the kilobyte MV, ~flat
    "q_merge_upsert",
    "q_table_diff",
    "q_hll_union_rollup",
    # r11 mid-round: the write-amplification complement (MOR delete:
    # sidecar write is O(delta), MOR read adds one broadcast anti --
    # 10x wall should track the base scan, far under 10x) and the
    # theta cohort algebra (MV-side kilobyte work, ~flat like the
    # HLL rollup; its exact reference self-join is the lane's honest
    # fact-side cost)
    "q_delete_merge_on_read",
    "q_theta_set_algebra",
    # r12 (VERDICT r11 item 3): the five r11 lanes that shipped
    # without sf1 rows get them -- TTL (metadata drops + ONE boundary
    # partition; the scratch clone is hardlinks, so ~flat), the
    # transactional streaming-MERGE sink (per-batch O(affected
    # quarter) + metadata; the kill/resume harness is the fixed
    # cost), bucket pruning (opens <= 3/16 of a 10x table -- the
    # pruned fraction IS the scaling story), and the two sketch
    # rollups (any-range quantiles off kilobyte MVs, ~flat like the
    # HLL rollup; their exact references are the honest fact cost)
    "q_retention_ttl",
    "q_stream_merge_sink",
    "q_bucket_pruning",
    "q_kll_quantile_sketch",
    "q_quantile_histogram_rollup",
]

# table -> id columns to offset per shard
_SF1_TABLES = {
    "documents": ["doc_id"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    # r9: orders + supplier shard with offsets MATCHING lineitem /
    # customer (o_orderkey~l_orderkey, o_custkey~c_custkey,
    # s_suppkey~l_suppkey), so Q7's join keys stay consistent across
    # shards; events shards per (event_id, user_id) so the streaming
    # CDC lane's per-key state is 10x keys with unchanged per-key
    # history (scripts/sf1_verify.py runs it on the combined dir)
    "orders": ["o_orderkey", "o_custkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}

# dimension tables copied through VERBATIM (content must stay 1x:
# nation keys are referenced unchanged by every shard)
_SF1_DIMS = ("nation",)

# bump when the construction changes so a cached corpus is not reused
_SF1_CORPUS_VERSION = 4


# The five most expensive sf1 queries (VERDICT r12 item 4): a SECOND
# measured decade (100x of the headline SF) turns the 10x ratios into
# a CURVE -- per lane, does the per-decade ratio flatten (fixed costs
# amortizing), hold (scan-bound linear), or COMPOUND (a super-linear
# stage the first decade hid)? The lane is run MANUALLY via
# `python scripts/sf10_spot.py` (pass count via
# SPARK_GRAFT_SF10_PASSES; corpus build + triple-interleaved passes
# cost tens of minutes, far past the driver's per-round budget); the
# run lands at bench_records/SF10_SPOT.json -- a committed run of record
# -- and every subsequent bench run embeds that record into
# BENCH_DETAIL as `sf10_spot` (marked "recorded": true) so the round
# artifact carries the curve without re-paying the run.
SF10_QUERIES = [
    "q_fuzzy_blocked",
    # r14 (VERDICT r13 item 2): the sampled twin rides the lane at the
    # exact density where the purged blocker collapsed to 0 rows --
    # its cap^2/2-per-bucket bound must hold work AND output at 100x
    "q_fuzzy_blocked_sampled",
    "q_setsim_prefix_join",
    "q_pagerank_bipartite",
    "q_stats_mad",
    "q_merge_upsert",
]

# table -> id columns to offset per shard (only the tables the five
# sf10 queries read; the 100x build is 10x lineitem bytes, so tables
# nothing reads are not built)
_SF10_TABLES = {
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "documents": ["doc_id"],
}

# bump when the construction changes so a cached corpus is not reused
_SF10_CORPUS_VERSION = 1


def _cpu_busy() -> float:
    """System-wide busy CPU seconds since boot (user+nice+system+...,
    everything except idle+iowait), from /proc/stat. Recorded per pass
    next to wall time (VERDICT r8 item 3): this box throttles (guest
    sees idle CPUs while wall stalls -- README 'Measured scaling'), so
    a slow pass with a LOW busy/wall ratio is host throttle while a
    slow pass with a HIGH ratio is the query doing real work; without
    this in the artifact a throttled round contradicts README claims
    with no evidence to adjudicate."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    busy = sum(vals) - vals[3] - vals[4]
    return busy / os.sysconf("SC_CLK_TCK")


def _clean_pass_filter(spins: list[float], busy_fracs: list[float],
                       spin_tol: float = 1.12,
                       busy_tol: float = 0.08) -> list[int]:
    """Indices of UNCONTAMINATED passes (VERDICT r11 item 6): a pass
    counts as clean when its clock calibration sits within spin_tol
    of the round's fastest pass (clock throttle / steal shows up
    here) AND its system-wide busy fraction sits within busy_tol of
    the round's quietest pass (a co-tenant burning cores shows up
    here -- the bench's own work is identical across passes, so
    excess busy is someone else's). The r11 driver artifact (passes
    4-5: wall 73/76 s vs 35 s, pass CPU doubled, spin +5-30%) is
    exactly what this excludes. The spin and busy references can be
    DIFFERENT passes (fastest clock during co-tenant load, quiet pass
    clock-throttled), so the intersection can be empty -- in that
    split-minima case fall back to the argmin-spin pass alone
    (ADVICE r12: an empty filter crashed the whole bench line), so
    the filtered median is never empty.

    Singleton-reference guard (r13): a single anomalously-FAST
    calibration (one pass catching a turbo window -- the first r13
    record run measured one 0.0825 s spin against a uniform
    0.098-0.110 cluster with uniform walls and busy) must not become
    the yardstick that disqualifies every ordinary pass and leaves
    the 'filtered' headline resting on that one sample. So when the
    min-referenced filter keeps no pass but its own, the filter
    retries with the SECOND-smallest spin as reference and accepts
    that answer only if at least two passes agree under it -- a
    cluster can outvote an uncorroborated singleton, but a genuinely
    degraded tail (spins spread far past tolerance, or busy
    contamination) still collapses to the single cleanest pass."""
    n = len(spins)
    ref_busy = min(busy_fracs)

    def _with_ref(ref_spin: float) -> list[int]:
        return [
            i for i in range(n)
            if spins[i] <= ref_spin * spin_tol
            and busy_fracs[i] <= ref_busy + busy_tol
        ]

    clean = _with_ref(min(spins))
    if len(clean) <= 1 and n >= 3:
        retry = _with_ref(sorted(spins)[1])
        if len(retry) >= 2:
            clean = retry
    return clean if clean else [spins.index(min(spins))]


def _true_med(xs: list[float], nd: int = 3) -> float:
    """Proper median: averages the middle pair for even-length input.
    The headline lane's upper-middle shortcut is harmless over 5
    passes, but the FILTERED medians often see 2 clean passes, where
    upper-middle degenerates to max() and biases the clean number
    ABOVE the raw one it exists to correct."""
    s = sorted(xs)
    n = len(s)
    m = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return round(m, nd)


def _spin_calib(n: int = 2_000_000) -> float:
    """Clock attribution (VERDICT r10 item 2): wall seconds for a
    FIXED single-threaded pure-Python workload, sampled before each
    pass. busy-CPU alone (eff_cores) cannot distinguish 'the box
    burned more cycles per row' (clock throttle / steal: same busy
    cores, slower cycles) from 'the query did more work'; a constant
    calibration loop can -- on a healthy box this number is stable
    within a few percent, and a pass whose queries slow UNIFORMLY
    while spin_sec inflates in the same proportion was throttled, not
    regressed. Recorded per pass in the artifact so a throttled round
    is adjudicable from BENCH_r{N} alone."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i * i
    assert x >= 0  # keep the loop un-optimizable
    return round(time.perf_counter() - t0, 4)


def _build_10x_corpus(spark, src: str, dest: str, shards: int = 10) -> None:
    """10 id-offset shards of the tables SF1_QUERIES read -- the
    sharded shape of a real 10x ingest: disjoint graph/join keys per
    shard (10 disconnected PageRank components), and per-shard entity
    populations that are DISTINCT, not perturbed twins of shard 0:

    - customer.c_name is regenerated from a DENSE key
      ('Customer#%09d' of shard*n_rows + original), exactly the name
      population of a larger table. Two rejected constructions, both
      corpus artifacts rather than plan behavior: v1 suffixed shard
      0's names (prefix blocking bands identical across shards ->
      surviving buckets grow 10x in SIZE, pairs x100 -- the measured
      13.6x step); v2 derived names from the 1e8-offset keys (every
      cross-shard twin sits one digit-edit apart -> the TRUE <=2-edit
      pair count itself grew 68x). c_custkey keeps the 1e8 offsets for
      key uniqueness; only the display name densifies.
    - documents.text goes through a per-shard alphabet rotation
      (translate), so shard vocabularies are token-disjoint: shingle /
      fingerprint structure within a shard is preserved verbatim while
      cross-shard near-dup collisions -- which a fresh 10x corpus does
      not have -- are zero. Length is preserved, so n_chars and the
      length-based quality filters stay consistent.

    Fidelity check: the 10x build of sf0.01 reproduces the NATIVE
    sf0.1 fuzzy-blocking output exactly (105,000 verified pairs both
    ways), so the construction is measured to be a faithful scale-up,
    not merely argued. Idempotent per (dest); built once per
    container."""
    from pyspark.sql import functions as F

    marker = Path(dest) / "_BUILT"
    if marker.exists():
        return
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for table, idcols in _SF1_TABLES.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        n_rows = df.count() if table == "customer" else 0
        parts = []
        for i in range(shards):
            c = df
            for col in idcols:
                c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
            if table == "customer":
                c = c.withColumn(
                    "c_name",
                    F.format_string(
                        "Customer#%09d",
                        F.col("c_custkey")
                        + F.lit(i * n_rows - i * 100_000_000),
                    ),
                )
            elif table == "documents" and i > 0:
                rot = alpha[i:] + alpha[:i]
                c = c.withColumn("text", F.translate("text", alpha, rot))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{dest}/{table}.parquet")
    for table in _SF1_DIMS:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite").parquet(f"{dest}/{table}.parquet")
    marker.touch()


def _shard_tag(i: int) -> str:
    """Two-letter shard tag: distinct for every i < 676, and two
    DISTINCT tags can never yield the same suffixed token (string
    equality forces the trailing chars equal position-by-position
    from the end, i.e. forces tag equality)."""
    return chr(ord("a") + i // 26) + chr(ord("a") + i % 26)


def _build_100x_corpus(spark, src: str, dest: str,
                       shards: int = 100) -> None:
    """The second decade of the sharded-ingest construction
    _build_10x_corpus pins at 10x: `shards` id-offset shards of the
    tables SF10_QUERIES read. Same skeleton (disjoint join/graph keys
    per shard via +i*1e8 offsets -- BIGINT columns hold 99 shards
    comfortably), with the two population constructions re-derived
    for 100 shards:

    - documents: the 10x alphabet ROTATION has only 26 distinct
      permutations, so shards i and i+26 would carry IDENTICAL text
      -- cross-shard exact-dup collisions a fresh 100x corpus does
      not have. Instead every alnum token run gets a per-shard
      2-letter TAG glued on. Suffixing by one tag is injective
      (equal tokens stay equal, distinct stay distinct), so each
      shard's token-SET structure -- and therefore its qualifying
      pair set -- is preserved VERBATIM; distinct tags can never
      collide across shards (_shard_tag), so cross-shard Jaccard is
      identically zero and pairs(Nx) == N * pairs(1x) EXACTLY
      (pinned at small scale in tests/test_sf10_corpus.py). Shard 0
      is tagged too: raw text could collide with tagged text
      ("coolaa" vs "cool"+tag "aa"). The stored n_chars column is
      NOT rewritten -- setsim (the only sf10 consumer) ignores it.
    - customer keeps the sf1 lane's DENSE name population
      ('Customer#%09d' of shard*n_rows + original): exactly the name
      population of a 100x table. Consequence worth stating up
      front: at 1.5M dense names EVERY positional 3-gram digit band
      exceeds q_fuzzy_blocked's fixed df<=200 blocking cap, so its
      recall collapses by design at this decade -- the documented
      behavior of a fixed-cap blocker on a dense population, not a
      corpus artifact (at sf1's 150k names the last-3-digit bands
      sit at df~150, just under the cap; at 1.5M they sit at ~1500).
      The lane records out_rows at every decade so the artifact
      shows the collapse next to the wall ratio (README 'Measured
      scaling' names the cause).

    lineitem values (quantity/price/dates) are replicated verbatim
    per shard, so value-distribution statistics are EXACTLY scale
    invariant: q_stats_mad at 100x must equal q_stats_mad at 1x
    (also pinned in tests/test_sf10_corpus.py). Idempotent per
    (dest); built once per container."""
    from pyspark.sql import functions as F

    marker = Path(dest) / "_BUILT"
    if marker.exists():
        return
    for table, idcols in _SF10_TABLES.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        n_rows = df.count() if table == "customer" else 0
        parts = []
        for i in range(shards):
            c = df
            for col in idcols:
                c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
            if table == "customer":
                c = c.withColumn(
                    "c_name",
                    F.format_string(
                        "Customer#%09d",
                        F.col("c_custkey")
                        + F.lit(i * n_rows - i * 100_000_000),
                    ),
                )
            elif table == "documents":
                c = c.withColumn(
                    "text",
                    F.regexp_replace(
                        "text", "([A-Za-z0-9]+)", "$1" + _shard_tag(i)
                    ),
                )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.write.mode("overwrite").parquet(f"{dest}/{table}.parquet")
    for table in _SF1_DIMS:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite").parquet(f"{dest}/{table}.parquet")
    marker.touch()


def _run_sf10_lane(spark, sf_dir: str, sf: str,
                   passes: int = 2, budget_s: int = 3600) -> dict:
    """The sf10 spot lane (VERDICT r12 item 4): per pass, each query
    runs at 100x IMMEDIATELY FOLLOWED by its 10x and 1x twins --
    same-conditions denominators at every decade, the r12 lesson --
    with a forced JVM GC before every measured run (same JMH
    discipline as the sf1 lane: q_fuzzy_blocked's pair shuffles
    directly precede setsim here too). Reports per-decade ratios
    decade1_x = 10x/1x and decade2_x = 100x/10x plus their quotient
    compound_x: ~1 means the lane's cost model holds across decades,
    >>1 names a super-linear stage. The warm pass doubles as the
    output probe (out_rows at all three decades separates
    output-bound growth and recall collapse from plan regression)."""
    import tempfile

    sf1_dir = (f"{tempfile.gettempdir()}/spark_graft_10x_sf{sf}"
               f"_v{_SF1_CORPUS_VERSION}")
    sf10_dir = (f"{tempfile.gettempdir()}/spark_graft_100x_sf{sf}"
                f"_v{_SF10_CORPUS_VERSION}")
    _build_10x_corpus(spark, sf_dir, sf1_dir)
    _build_100x_corpus(spark, sf_dir, sf10_dir)
    decades = (("sf100x", sf10_dir), ("sf10x", sf1_dir), ("sf1x", sf_dir))

    def force_at(name: str, d: str) -> None:
        registry.QUERIES[name](spark, d).write.format("noop").mode(
            "overwrite").save()

    out_rows = {k: {} for k, _ in decades}
    for name in SF10_QUERIES:
        for dkey, ddir in decades:
            out_rows[dkey][name] = (
                registry.QUERIES[name](spark, ddir).count())
            force_at(name, ddir)  # warm: plan + codegen at these stats

    jvm_gc = spark.sparkContext._jvm.System.gc
    runs = {k: {n: [] for n in SF10_QUERIES} for k, _ in decades}
    pass_wall: list[float] = []
    pass_cpu: list[float] = []
    pass_spin: list[float] = []
    done = 0
    over_budget = False
    lane_t0 = time.perf_counter()
    for _ in range(passes):
        # cold-cache passes (r15, VERDICT r14 item 4): the persisted
        # lanes (PageRank's edge-list cache) otherwise measure warm
        # cache from pass 2 on -- and the decade RATIOS mix a cold
        # cell against a warm one. Every pass now pays the build.
        spark.catalog.clearCache()
        pass_spin.append(_spin_calib())
        # samples-per-list snapshot: a budget break mid-pass discards
        # the partial pass's timings so the medians only ever mix
        # samples from passes with an accounted pass_wall/pass_cpu row
        # (ADVICE r13: a partial pass has no wall/cpu entry, so its
        # samples would be unauditable by the clean-pass filter)
        pre = {k: {n: len(ts) for n, ts in qs.items()}
               for k, qs in runs.items()}
        pw0, pc0 = time.perf_counter(), _cpu_busy()
        for name in SF10_QUERIES:
            for dkey, ddir in decades:
                jvm_gc()
                t0 = time.perf_counter()
                force_at(name, ddir)
                runs[dkey][name].append(time.perf_counter() - t0)
            if done >= 1 and time.perf_counter() - lane_t0 > budget_s:
                over_budget = True
                break
        else:
            done += 1
            pass_wall.append(round(time.perf_counter() - pw0, 3))
            pass_cpu.append(round(_cpu_busy() - pc0, 3))
            continue
        for k, qs in runs.items():
            for n, ts in qs.items():
                del ts[pre[k][n]:]
        break
    med = {
        k: {n: _true_med(ts) for n, ts in qs.items() if ts}
        for k, qs in runs.items()
    }

    def _ratio(num: dict, den: dict) -> dict:
        return {
            n: round(num[n] / den[n], 2)
            for n in num if den.get(n)
        }

    decade1 = _ratio(med["sf10x"], med["sf1x"])
    decade2 = _ratio(med["sf100x"], med["sf10x"])
    return {
        "sf_decades": {k: round(float(sf) * m, 4) for (k, _), m in
                       zip(decades, (100, 10, 1))},
        "queries": med,
        "spread": {
            k: {n: [round(min(ts), 3), round(max(ts), 3)]
                for n, ts in qs.items() if ts}
            for k, qs in runs.items()
        },
        "decade1_x": decade1,
        "decade2_x": decade2,
        "compound_x": _ratio(decade2, decade1),
        "out_rows": out_rows,
        "passes": done,
        "over_budget": over_budget,
        "pass_wall": pass_wall,
        "pass_cpu": pass_cpu,
        "spin_sec": pass_spin,
        "busy_frac": [
            round(c / (w * os.cpu_count()), 3)
            for c, w in zip(pass_cpu, pass_wall)
        ],
        "eff_cores": [
            round(c / w, 2) for c, w in zip(pass_cpu, pass_wall)
        ],
        "corpus_version": _SF10_CORPUS_VERSION,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry.load_all_queries()
    names = [n for n in HEADLINE if n in registry.QUERIES]

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: str) -> None:
        # noop sink forces every output column to be materialized (count()
        # would let Catalyst prune the projection)
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # one warm pass: JVM/codegen/noop-datasource class loading and parquet
    # footer caching, so timed runs measure the query plan, not startup
    for name in names:
        force(name)

    # 5 interleaved passes: the r6 sf0.1 run showed single-PASS host
    # stalls (VM steal / GC) inflating 3 unrelated queries 10-20x in
    # the same pass; a median of 5 needs two bad passes to move, where
    # a median of 3 moves on one. Spread still reports min/max so the
    # stalls stay visible.
    N_RUNS = 5
    runs: dict[str, list[float]] = {name: [] for name in names}
    pass_wall: list[float] = []
    pass_cpu: list[float] = []
    pass_spin: list[float] = []
    for _ in range(N_RUNS):
        # COLD-CACHE medians (r15, VERDICT r14 item 4 -- a deliberate,
        # disclosed measurement fix): q_pagerank_bipartite persists its
        # edge list, and CacheManager dedupes by canonicalized plan, so
        # passes 2-5 previously hit a warm cache built in pass 1 -- the
        # headline median measured cache reuse, not what a fresh job
        # pays. Clearing between passes makes every pass pay the build;
        # the r14 warm-median for pagerank was 3.5 s, so a higher r15
        # number for that one lane is the honest cold cost, not a
        # regression (OPTIMIZATION_r15.md keeps both numbers).
        spark.catalog.clearCache()
        pass_spin.append(_spin_calib())
        pw0, pc0 = time.perf_counter(), _cpu_busy()
        for name in names:
            t0 = time.perf_counter()
            force(name)
            runs[name].append(time.perf_counter() - t0)
        pass_wall.append(round(time.perf_counter() - pw0, 3))
        pass_cpu.append(round(_cpu_busy() - pc0, 3))
    timings = {
        name: round(sorted(ts)[len(ts) // 2], 3) for name, ts in runs.items()
    }
    spread = {
        name: [round(min(ts), 3), round(max(ts), 3)]
        for name, ts in runs.items()
    }
    total = round(sum(timings.values()), 3)
    # effective cores per pass: busy-cpu seconds / wall seconds. On an
    # unthrottled 32-cpu box the heavier passes sit well above 1; a
    # pass whose wall inflates while eff_cores DROPS was starved by the
    # host, not slowed by the code.
    busy_frac = [
        round(c / (w * os.cpu_count()), 3)
        for c, w in zip(pass_cpu, pass_wall)
    ]
    # the SESSION's core count, read back from the master the session
    # actually runs with (r15, VERDICT r14 item 2): the harness honors
    # $SPARK_GRAFT_CPUS (session.py builds local[$SPARK_GRAFT_CPUS]),
    # but the JSON line never SAID so, and the driver's scaling
    # heuristic had nothing to check the 8-core run against -- it
    # flagged `suspect_cpus_ignored` against a harness that complies.
    master = spark.sparkContext.master
    try:
        session_cpus = int(master.split("[", 1)[1].rstrip("]"))
    except (IndexError, ValueError):  # local[*] or a cluster master
        session_cpus = os.cpu_count()
    cpu_attr = {
        "cpus": session_cpus,
        "pass_wall": pass_wall,
        "pass_cpu": pass_cpu,
        "eff_cores": [round(c / w, 2) for c, w in zip(pass_cpu, pass_wall)],
        # fixed-workload clock calibration per pass: uniform query
        # slowdown + proportional spin_sec inflation = host throttle;
        # stable spin_sec + slower queries = real regression
        "spin_sec": pass_spin,
        # system-wide busy fraction per pass (VERDICT r11 item 6):
        # the bench's own work is constant across passes, so a pass
        # whose fraction jumps was sharing the box with a co-tenant
        "busy_frac": busy_frac,
        "os_cpus": os.cpu_count(),
    }
    # contamination-filtered headline NEXT TO the raw one (VERDICT r11
    # item 6): per-query medians over only the passes whose spin and
    # system-busy sit within tolerance of the round's cleanest pass,
    # so a round measured on a contended host self-adjudicates from
    # the artifact alone (r11's driver run needed commit archaeology).
    clean = _clean_pass_filter(pass_spin, busy_frac)
    timings_clean = {
        name: _true_med([ts[i] for i in clean])
        for name, ts in runs.items()
    }
    filtered = {
        "value": round(sum(timings_clean.values()), 3),
        "clean_passes": clean,
        "queries": timings_clean,
    }

    # the reference's core job: gz-XML -> Snappy Parquet throughput over
    # a deterministic synthetic corpus (rows scaled by SF; 8 files ->
    # 8 scan tasks, mirroring the reference's 1-thread-per-file x 8)
    import tempfile

    from discogs_xml_to_parquet_spark.sources.discogs_xml import convert
    from discogs_xml_to_parquet_spark.sources.fixture import (
        write_synthetic_releases,
    )

    # 10M rows/SF = 1M rows at sf0.1 (r4 verdict item 7; was 200k): at
    # smaller sizes the conversion is warmup/task-startup-dominated and
    # rows/s swings ~1.5x round-over-round; at 1M rows the 8 gzip
    # streams run tens of seconds, so the number is steady-state and
    # comparable against the single-threaded reference. The corpus dir
    # is params-keyed and idempotent -- generation cost is paid once
    # per container, not per bench run.
    n_rel = max(int(10_000_000 * float(sf)), 2_000)
    xml_dir = write_synthetic_releases(
        f"{tempfile.gettempdir()}/discogs_bench_{n_rel}", n_rel, n_files=8
    )
    out = f"{tempfile.gettempdir()}/discogs_bench_out"
    # warm on a tiny corpus (XML source class load, codegen): pays the
    # fixed startup without running the full 1M-row conversion twice
    warm_dir = write_synthetic_releases(
        f"{tempfile.gettempdir()}/discogs_bench_warm", 2_000, n_files=8
    )
    convert(spark, warm_dir, out)

    # scale-out corpus: the SAME rows split into 32 gzip files. Gzip is
    # unsplittable (1 task per file), so file count IS the conversion's
    # parallelism knob -- the 32-file lane measures the engine's
    # scale-out story against the 8-file lane (the reference is locked
    # to 1 thread total; main.rs:436-473).
    xml_dir32 = write_synthetic_releases(
        f"{tempfile.gettempdir()}/discogs_bench_{n_rel}_f32", n_rel,
        n_files=32,
    )

    def timed_run(src: str) -> tuple[float, float, float]:
        spin = _spin_calib()
        t0, c0 = time.perf_counter(), _cpu_busy()
        convert(spark, src, out)
        return (round(time.perf_counter() - t0, 3),
                round(_cpu_busy() - c0, 3), spin)

    # Both lanes run once cold (unreported numbers kept for drift
    # visibility: in a fresh container the cold run pays the page-cache
    # fill + writeback of a just-written 1M-row corpus -- the r5
    # driver bench caught exactly that), then three warm rounds with
    # the 8-file and 32-file lanes INTERLEAVED (VERDICT r8 item 3: the
    # r8 artifact showed 32-file slower than 8-file, but the lanes ran
    # minutes apart on a box whose throttle state drifts within a run
    # -- interleaving makes the comparison same-conditions the way the
    # query passes already are). Medians reported; per-run wall + busy
    # CPU recorded so a throttled run is attributable in-artifact.
    conv_cold = timed_run(xml_dir)
    conv32_cold = timed_run(xml_dir32)
    conv_runs: list[tuple[float, float, float]] = []
    conv32_runs: list[tuple[float, float, float]] = []
    for _ in range(3):
        conv_runs.append(timed_run(xml_dir))
        conv32_runs.append(timed_run(xml_dir32))
    conv_sec = sorted(w for w, _, _ in conv_runs)[1]
    conv32_sec = sorted(w for w, _, _ in conv32_runs)[1]

    # long-tail spot-check lane (VERDICT r5 item 7): sample 5 of the
    # registered queries outside the headline set, seeded by the round
    # number (round = count of driver-recorded BENCH_r*.json + 1, so
    # each round rotates deterministically), and report the median of
    # 3 timed runs each (after one warm run) so perf regressions
    # outside the headline set get caught within a few rounds.
    import random

    round_no = 1 + len(list(Path(__file__).resolve().parent.glob(
        "BENCH_r*.json")))
    pool = sorted(n for n in registry.QUERIES if n not in set(names))
    longtail = random.Random(round_no).sample(pool, min(5, len(pool)))
    lt_timings: dict[str, float] = {}
    for name in longtail:
        force(name)  # warm: plan + codegen
        lt_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(name)
            lt_runs.append(time.perf_counter() - t0)
        lt_timings[name] = round(sorted(lt_runs)[1], 3)  # median of 3

    # 10x spot lane (VERDICT r6 item 4): the 2x-of-BASELINE gate runs
    # at sf0.1 where fixed stage latencies dominate; this lane times
    # the five most expensive queries on a 10x corpus (sf1.0 for the
    # default sf0.1 input) so a super-linear step in the fused plans
    # shows up BEFORE anyone claims 100x. The corpus is 10 id-offset
    # shards of the bench tables (text/name suffixed per shard so
    # dedup/blocking buckets are not 10 exact copies of themselves;
    # graph ids disjoint per shard -- the sharded shape a real 10x
    # ingest has). Built once per container under /tmp, keyed by SF.
    # Median of 3 interleaved passes after one warm pass, same noise
    # policy as the headline lane. SPARK_GRAFT_SKIP_SF1=1 skips the
    # lane for quick local iterations.
    sf1_spot = None
    if not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        sf1_dir = (f"{tempfile.gettempdir()}/spark_graft_10x_sf{sf}"
                   f"_v{_SF1_CORPUS_VERSION}")
        _build_10x_corpus(spark, sf_dir, sf1_dir)
        sf1_timings: dict[str, float] = {}
        sf1_runs: dict[str, list[float]] = {n: [] for n in SF1_QUERIES}

        def force_sf1(name: str) -> None:
            registry.QUERIES[name](spark, sf1_dir).write.format(
                "noop").mode("overwrite").save()

        # warm pass doubles as the output-size probe: out_rows at both
        # SFs separate output-bound growth from plan regression (e.g.
        # fuzzy on zero-padded sequential numeric names has an
        # inherently quadratic TRUE <=2-edit pair count -- measured
        # 105k pairs at sf0.1 vs 7.2M at sf1.0, so its wall ratio
        # tracks its output ratio, not a join blowup)
        out_rows = {}
        out_rows_01 = {}
        for name in SF1_QUERIES:
            out_rows[name] = registry.QUERIES[name](spark, sf1_dir).count()
            out_rows_01[name] = registry.QUERIES[name](spark, sf_dir).count()
            force_sf1(name)  # warm: plan + codegen at the new stats
            force(name)      # warm the headline-SF twin too
        # lane wall budget: the whole bench must finish inside the
        # driver's timeout, and a throttled box can triple a pass --
        # degrade to fewer (even partial) recorded passes rather than
        # risk losing the entire JSON line. The budget is checked
        # inside the per-query loop (ADVICE r7: a single throttled
        # pass, ~10-60 s/query warm at 10x and up to 3x that, could
        # otherwise overshoot by minutes before a between-pass check
        # triggers) -- but only once every query has >= 1 timing, so
        # the medians below never divide by an empty list. "passes"
        # reports completed full passes.
        # Each pass runs every query at sf1 IMMEDIATELY FOLLOWED by
        # its headline-SF twin (r12): the 10x ratio is the lane's
        # whole point, and its two sides must be measured under the
        # SAME conditions. The previous shape took denominators from
        # the interleaved headline lane or a hot back-to-back block
        # after the lane -- systematically cooler than the lane
        # interior -- and the mismatch alone moved setsim's measured
        # ratio between 3.5x and 4.8x on an otherwise-quiet box.
        # Adjacent same-pass runs share session temperature, storage
        # pressure, and whatever the co-tenant is doing.
        #
        # JMH discipline (r12): a forced JVM GC precedes every
        # measured run, so one query's garbage (q_fuzzy_blocked's
        # 7.2M-pair shuffles directly precede setsim) never bills the
        # NEXT query's wall as old-gen pressure -- measured 19 s ->
        # 15 s for setsim-after-fuzzy at sf1, while solo runs were
        # 13.5 s all along. Headline passes stay GC-free: their raw
        # value is the round-over-round comparable and its queries
        # are too small for cross-billing to matter.
        jvm_gc = spark.sparkContext._jvm.System.gc
        sf01_runs: dict[str, list[float]] = {n: [] for n in SF1_QUERIES}
        lane_t0 = time.perf_counter()
        passes = 0
        over_budget = False
        sf1_pass_wall: list[float] = []
        sf1_pass_cpu: list[float] = []
        sf1_pass_spin: list[float] = []
        for _ in range(3):
            # cold-cache passes, same rule as the headline loop (r15)
            spark.catalog.clearCache()
            sf1_pass_spin.append(_spin_calib())
            pw0, pc0 = time.perf_counter(), _cpu_busy()
            for name in SF1_QUERIES:
                jvm_gc()
                t0 = time.perf_counter()
                force_sf1(name)
                t1 = time.perf_counter()
                jvm_gc()
                t1b = time.perf_counter()
                force(name)
                t2 = time.perf_counter()
                sf1_runs[name].append(t1 - t0)
                sf01_runs[name].append(t2 - t1b)
                if (passes >= 1
                        and time.perf_counter() - lane_t0 > 600):
                    over_budget = True
                    break
            else:
                passes += 1
                sf1_pass_wall.append(round(time.perf_counter() - pw0, 3))
                sf1_pass_cpu.append(round(_cpu_busy() - pc0, 3))
                continue
            break
        sf1_timings = {
            n: round(sorted(ts)[len(ts) // 2], 3)
            for n, ts in sf1_runs.items()
        }
        sf01_timings = {
            n: round(sorted(ts)[len(ts) // 2], 3)
            for n, ts in sf01_runs.items()
        }
        # contamination filter for the LANE too (same rule as the
        # headline): the 10x ratios are the artifact's scale
        # evidence, and a throttled lane pass inflates sf1 walls
        # while the sf0.1 denominators come from a different time
        # window -- the filtered ratios let a contended round
        # self-adjudicate (guarded: zero completed passes on an
        # over-budget box means no per-pass attribution to filter)
        sf1_busy = [
            round(c / (w * os.cpu_count()), 3)
            for c, w in zip(sf1_pass_cpu, sf1_pass_wall)
        ]
        sf1_clean = (
            _clean_pass_filter(sf1_pass_spin[:passes], sf1_busy)
            if passes else []
        )
        sf1_filtered = {
            n: _true_med([ts[i] for i in sf1_clean])
            for n, ts in sf1_runs.items()
            if sf1_clean and len(ts) >= passes
        }
        sf01_filtered = {
            n: _true_med([ts[i] for i in sf1_clean])
            for n, ts in sf01_runs.items()
            if sf1_clean and len(ts) >= passes
        }
        sf1_spot = {
            "sf": round(float(sf) * 10, 4),
            "queries": sf1_timings,
            "spread": {
                n: [round(min(ts), 3), round(max(ts), 3)]
                for n, ts in sf1_runs.items()
            },
            "queries_at_headline_sf": sf01_timings,
            "vs_headline_x": {
                n: round(sf1_timings[n] / sf01_timings[n], 2)
                for n in SF1_QUERIES if sf01_timings.get(n)
            },
            "clean_passes": sf1_clean,
            "queries_filtered": sf1_filtered,
            "vs_headline_x_filtered": {
                n: round(sf1_filtered[n] / sf01_filtered[n], 2)
                for n in sf1_filtered if sf01_filtered.get(n)
            },
            "out_rows": out_rows,
            "out_rows_at_headline_sf": out_rows_01,
            "passes": passes,
            "over_budget": over_budget,
            "pass_wall": sf1_pass_wall,
            "pass_cpu": sf1_pass_cpu,
            "spin_sec": sf1_pass_spin,
            "busy_frac": [
                round(c / (w * os.cpu_count()), 3)
                for c, w in zip(sf1_pass_cpu, sf1_pass_wall)
            ],
            "eff_cores": [
                round(c / w, 2)
                for c, w in zip(sf1_pass_cpu, sf1_pass_wall)
            ],
        }

    # 100x spot lane (VERDICT r12 item 4): the lane itself runs out of
    # band (scripts/sf10_spot.py -- corpus build plus
    # triple-interleaved passes cost tens of minutes, far past the
    # driver's per-round budget) and commits its run of record at
    # bench_records/SF10_SPOT.json; every bench run embeds that record
    # so BENCH_DETAIL and the stdout line always carry the latest
    # measured second-decade curve.
    sf10_rec = (Path(__file__).resolve().parent
                / "bench_records" / "SF10_SPOT.json")
    sf10_spot = None
    if sf10_rec.exists():
        sf10_spot = json.loads(sf10_rec.read_text())
        sf10_spot["recorded"] = True

    full = {
        "metric": "headline_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "n": N_RUNS,
        "sf": sf,
        "cpu_attribution": cpu_attr,
        "filtered": filtered,
        "conversion": {
            "files": 8,
            "rows": n_rel,
            "sec": conv_sec,
            "cold_sec": conv_cold[0],
            "rows_per_sec": round(n_rel / conv_sec),
            "runs_wall_cpu_spin": conv_runs,
            "eff_cores": [round(c / w, 2) for w, c, _ in conv_runs],
            "spin_sec": [s for _, _, s in conv_runs],
        },
        "conversion_scaleout": {
            "files": 32,
            "rows": n_rel,
            "sec": conv32_sec,
            "cold_sec": conv32_cold[0],
            "rows_per_sec": round(n_rel / conv32_sec),
            "runs_wall_cpu_spin": conv32_runs,
            "eff_cores": [round(c / w, 2) for w, c, _ in conv32_runs],
            "spin_sec": [s for _, _, s in conv32_runs],
            "interleaved_with_8file": True,
        },
        "longtail": {"round": round_no, "queries": lt_timings},
        "sf1_spot": sf1_spot,
        "sf10_spot": sf10_spot,
    }

    # The driver records only the LAST 2000 chars of stdout (every
    # BENCH_r1..r8 artifact holds a mid-line truncated 'tail' and
    # 'parsed': None -- the full dict above has never survived into a
    # round-of-record artifact). So: the full dict goes to a repo file,
    # and stdout gets ONE COMPACT line (<= ~1900 chars) holding the
    # contract keys (metric/value/unit/queries/sf) plus the adjudication
    # essentials (eff-cores medians, conversion rates, sf1 lane, budget
    # flag) so the recorded tail contains the complete, parseable line.
    # BENCH_DETAIL.json is a WORKING COPY, gitignored since r13
    # (VERDICT r12 "what's wrong" #1: the driver's re-run kept
    # clobbering the committed run of record, leaving a dirty tree at
    # judging). The run of record is an explicit act now: set
    # SPARK_GRAFT_BENCH_RECORD=r13 and the same dict ALSO lands at
    # bench_records/BENCH_DETAIL_r13.json, a per-round name nothing
    # ever overwrites -- commit that.
    detail = json.dumps(full, indent=1) + "\n"
    repo = Path(__file__).resolve().parent
    (repo / "BENCH_DETAIL.json").write_text(detail)
    record = os.environ.get("SPARK_GRAFT_BENCH_RECORD")
    if record:
        rec_dir = repo / "bench_records"
        rec_dir.mkdir(exist_ok=True)
        (rec_dir / f"BENCH_DETAIL_{record}.json").write_text(detail)

    print(compact_line(full))
    spark.stop()


# recorder tail cap is 2000 chars; leave headroom for a trailing newline
# and any recorder-side framing
_LINE_BUDGET = 1950


def _med(xs: list[float], nd: int = 2) -> float:
    return round(sorted(xs)[len(xs) // 2], nd) if xs else 0.0


def compact_line(full: dict) -> str:
    """The single stdout line, guaranteed <= _LINE_BUDGET chars so the
    recorder's 2000-char tail holds it WHOLE (and parseable). Trim
    ladder, ballast before precision: drop longtail -> 1-dp query
    medians -> drop per-query sf1 medians (lane summary stays). The
    contract keys (metric/value/unit/queries/sf) always survive."""
    sf1 = full.get("sf1_spot")
    sf10 = full.get("sf10_spot")
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": dict(full["queries"]),
        "n": full["n"],
        "sf": full["sf"],
        "eff_cores_median": _med(full["cpu_attribution"]["eff_cores"]),
        # fixed spin-loop calibration median (seconds): compare across
        # rounds -- proportional inflation alongside uniform query
        # slowdown = host clock throttle, not a code regression
        "spin_sec_median": _med(full["cpu_attribution"]["spin_sec"], 3),
        "os_cpus": full["cpu_attribution"]["os_cpus"],
        # contamination-filtered headline (passes within spin +
        # system-busy tolerance of the cleanest -- see
        # _clean_pass_filter); raw value stays the contract number
        "value_filtered": (full.get("filtered") or {}).get("value"),
        "clean_passes": (full.get("filtered") or {}).get("clean_passes"),
        "conversion": {
            "rows": full["conversion"]["rows"],
            "f8_rows_per_sec": full["conversion"]["rows_per_sec"],
            "f32_rows_per_sec": full["conversion_scaleout"]["rows_per_sec"],
            "f8_eff_cores": _med(full["conversion"]["eff_cores"]),
            "f32_eff_cores": _med(
                full["conversion_scaleout"]["eff_cores"]),
            "interleaved": True,
        },
        "longtail": full["longtail"]["queries"],
        "sf1": None if sf1 is None else {
            "sf": sf1["sf"],
            "queries": dict(sf1["queries"]),
            "passes": sf1["passes"],
            "over_budget": sf1["over_budget"],
            "eff_cores_median": _med(sf1["eff_cores"]),
            "spin_sec_median": _med(sf1["spin_sec"], 3),
        },
        "detail": "BENCH_DETAIL.json",
    }
    # the session master's core count (local[N]) next to os_cpus
    # (r15, VERDICT r14 item 2): the harness honors $SPARK_GRAFT_CPUS
    # (session.py), but the line never SAID so, and the driver's
    # scaling heuristic had nothing to check the 8-core run against.
    # Omitted when absent -- even a null costs line budget.
    if full["cpu_attribution"].get("cpus") is not None:
        compact["cpus"] = full["cpu_attribution"]["cpus"]
    # second-decade curve (per-query 100x/10x ratios next to the
    # 10x/1x ones above; "recorded" marks an embedded prior run of
    # record rather than a fresh in-process measurement). Key omitted
    # entirely when no record exists -- even a null costs line budget.
    if sf10 is not None:
        compact["sf10"] = {
            "decade2_x": dict(sf10["decade2_x"]),
            "compound_x": dict(sf10["compound_x"]),
            "passes": sf10["passes"],
            "recorded": bool(sf10.get("recorded")),
        }

    def dumps() -> str:
        return json.dumps(compact, separators=(",", ":"))

    line = dumps()
    if len(line) > _LINE_BUDGET:  # trim ballast before precision
        compact.pop("longtail", None)
        line = dumps()
    if len(line) > _LINE_BUDGET:
        compact["queries"] = {
            k: round(v, 1) for k, v in compact["queries"].items()
        }
        line = dumps()
    if len(line) > _LINE_BUDGET and compact.get("sf10"):
        # the quotient is re-derivable from the committed
        # SF10_SPOT.json record; decade2_x itself is the new evidence
        compact["sf10"].pop("compound_x", None)
        line = dumps()
    if len(line) > _LINE_BUDGET and compact.get("sf1"):
        compact["sf1"].pop("queries", None)
        line = dumps()
    if len(line) > _LINE_BUDGET and compact.get("sf10"):
        # headline medians outrank the embedded record's detail: the
        # full curve stays in SF10_SPOT.json / BENCH_DETAIL
        compact.pop("sf10", None)
        line = dumps()
    # last resort: keep the slowest K queries and SAY how many were
    # omitted (never a silent cap) -- halve K until the line fits
    k = len(compact["queries"])
    by_cost = sorted(compact["queries"].items(), key=lambda kv: -kv[1])
    while len(line) > _LINE_BUDGET and k > 4:
        k //= 2
        compact["queries"] = dict(by_cost[:k])
        compact["queries_omitted"] = len(by_cost) - k
        line = dumps()
    if len(line) > _LINE_BUDGET:
        # terminal fallback (ADVICE r9): contract keys only -- the
        # docstring's bound must hold unconditionally, even for
        # pathological query-name lengths the K-halving can't absorb
        compact = {
            "metric": full["metric"],
            "value": full["value"],
            "unit": full["unit"],
            "queries": dict(by_cost[:4]),
            "queries_omitted": len(by_cost) - 4,
            "sf": full["sf"],
            "detail": "BENCH_DETAIL.json",
        }
        if full["cpu_attribution"].get("cpus") is not None:
            compact["cpus"] = full["cpu_attribution"]["cpus"]
        line = dumps()
    assert len(line) <= _LINE_BUDGET, len(line)  # fail loudly, never truncate
    return line


if __name__ == "__main__":
    main()
