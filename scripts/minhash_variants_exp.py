"""One-off experiment (round 5): compare three minhash-chain shapes on
the capstone path at sf0.1, interleaved to cancel sandbox drift.

A: no checkpoints, full-corpus shingles on both verify sides (r4 shape)
B: checkpoint candidate pairs + candidate-restricted verify shingles
C: checkpoint the shingle frame once; signatures and verify read it
"""
import sys, time
sys.path.insert(0, '/root/repo')

from pyspark.sql import functions as F
from discogs_xml_to_parquet_spark.session import get_spark
from discogs_xml_to_parquet_spark.tables import load_spread
from discogs_xml_to_parquet_spark.queries.quality import gopher_keep_filter
from discogs_xml_to_parquet_spark.operators import dedup as D
from discogs_xml_to_parquet_spark.operators import graph as G
from discogs_xml_to_parquet_spark.operators.text import quality_score, token_stats

spark = get_spark(app_name='minhash_exp')
spark.sparkContext.setLogLevel('ERROR')
sf_dir = '/root/testdata/sf0.1'


def build_collapsed():
    d = load_spread(spark, sf_dir, 'documents')
    kept = gopher_keep_filter(d).select('doc_id', 'text')
    hashed = kept.select('doc_id', F.md5('text').alias('text_hash'))
    groups = hashed.groupBy('text_hash').agg(F.min('doc_id').alias('keep_id'))
    exact_pairs = (
        hashed.join(groups, 'text_hash')
        .filter(F.col('doc_id') != F.col('keep_id'))
        .select(F.col('keep_id').alias('id1'), F.col('doc_id').alias('id2'))
    )
    collapsed = kept.join(
        groups.select(F.col('keep_id').alias('doc_id')), 'doc_id', 'semi'
    ).localCheckpoint()
    return collapsed, exact_pairs


def near_A(d):
    sh = d.select('doc_id', D.word_shingles(F.col('text')).alias('shingles')).filter(F.size('shingles') > 0)
    sigs = (sh.select('doc_id', D.minhash_signature(F.col('shingles')).alias('sig'))
            .repartition('doc_id')
            .select('doc_id', D.band_keys(F.col('sig')).alias('bands')))
    cand = D.lsh_candidate_pairs(sigs, 'doc_id', 'bands')
    s1 = sh.select(F.col('doc_id').alias('id1'), F.col('shingles').alias('sh1'))
    s2 = sh.select(F.col('doc_id').alias('id2'), F.col('shingles').alias('sh2'))
    return (cand.join(s1, 'id1').join(s2, 'id2')
            .select('id1', 'id2', D.jaccard(F.col('sh1'), F.col('sh2')).alias('jaccard_sim'))
            .filter(F.col('jaccard_sim') >= 0.5))


def near_B(d):
    sh = d.select('doc_id', D.word_shingles(F.col('text')).alias('shingles')).filter(F.size('shingles') > 0)
    sigs = (sh.select('doc_id', D.minhash_signature(F.col('shingles')).alias('sig'))
            .repartition('doc_id')
            .select('doc_id', D.band_keys(F.col('sig')).alias('bands')))
    cand = D.lsh_candidate_pairs(sigs, 'doc_id', 'bands').localCheckpoint()
    cand_ids = (cand.select(F.col('id1').alias('doc_id'))
                .union(cand.select(F.col('id2').alias('doc_id'))).distinct())
    sh_v = d.join(cand_ids, 'doc_id', 'semi').select(
        'doc_id', D.word_shingles(F.col('text')).alias('shingles'))
    s1 = sh_v.select(F.col('doc_id').alias('id1'), F.col('shingles').alias('sh1'))
    s2 = sh_v.select(F.col('doc_id').alias('id2'), F.col('shingles').alias('sh2'))
    return (cand.join(s1, 'id1').join(s2, 'id2')
            .select('id1', 'id2', D.jaccard(F.col('sh1'), F.col('sh2')).alias('jaccard_sim'))
            .filter(F.col('jaccard_sim') >= 0.5))


def near_C(d):
    sh = (d.select('doc_id', D.word_shingles(F.col('text')).alias('shingles'))
          .filter(F.size('shingles') > 0).localCheckpoint())
    sigs = (sh.select('doc_id', D.minhash_signature(F.col('shingles')).alias('sig'))
            .repartition('doc_id')
            .select('doc_id', D.band_keys(F.col('sig')).alias('bands')))
    cand = D.lsh_candidate_pairs(sigs, 'doc_id', 'bands')
    s1 = sh.select(F.col('doc_id').alias('id1'), F.col('shingles').alias('sh1'))
    s2 = sh.select(F.col('doc_id').alias('id2'), F.col('shingles').alias('sh2'))
    return (cand.join(s1, 'id1').join(s2, 'id2')
            .select('id1', 'id2', D.jaccard(F.col('sh1'), F.col('sh2')).alias('jaccard_sim'))
            .filter(F.col('jaccard_sim') >= 0.5))


def capstone_tail(collapsed, exact_pairs, near):
    all_pairs = near.select('id1', 'id2').union(exact_pairs)
    comp = G.connected_components_auto(
        all_pairs.select(F.col('id1').alias('src'), F.col('id2').alias('dst')))
    stats = quality_score(token_stats(collapsed)).select('doc_id', 'n_tokens', 'quality_score')
    labeled = stats.join(comp, stats['doc_id'] == comp['id'], 'left').select(
        stats['doc_id'], 'n_tokens', 'quality_score',
        F.coalesce('comp', stats['doc_id']).alias('component'))
    return labeled


VARIANTS = {'A': near_A, 'B': near_B, 'C': near_C}

# warm
c0, e0 = build_collapsed()
capstone_tail(c0, e0, near_A(c0)).write.format('noop').mode('overwrite').save()

results = {k: [] for k in VARIANTS}
for rep in range(3):
    for k, fn in VARIANTS.items():
        t0 = time.perf_counter()
        collapsed, exact_pairs = build_collapsed()
        capstone_tail(collapsed, exact_pairs, fn(collapsed)).write.format(
            'noop').mode('overwrite').save()
        results[k].append(round(time.perf_counter() - t0, 2))

for k, v in results.items():
    print(k, v, 'median', sorted(v)[1])
spark.stop()
