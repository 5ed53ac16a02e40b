import sys, time, os
sys.path.insert(0, '/root/repo')
from bigdata_jobmatching_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark('dissect')
spark.sparkContext.setLogLevel('ERROR')
SF = '/root/testdata/sf0.1'
SFW = '/root/testdata/sf0.001'

def noop(df): df.write.format('noop').mode('overwrite').save()

import bigdata_jobmatching_spark.operators.dedup as D
from bigdata_jobmatching_spark.plans.dedup_queries import _semantic_dedup, _SD_K, _SD_SUB_TARGET, _SD_BITS_MAX
from bigdata_jobmatching_spark.sources.io import load_table

# warm
noop(_semantic_dedup(spark, SFW))

def blocking_only():
    e = load_table(spark, SF, 'embeddings')
    parts = D.semantic_blocks(e, 'vec_id', 'embedding', _SD_K, _SD_SUB_TARGET, _SD_BITS_MAX)
    # building SemanticParts runs the two eager checkpoints (asg, v) + norms eager
    return parts

for rnd in range(3):
    t0 = time.time(); parts = blocking_only(); t1 = time.time()
    noop(parts.v.groupBy('cluster', 'sig').count())  # tiny consumer
    t2 = time.time()
    noop(_semantic_dedup(spark, SF))
    t3 = time.time()
    print(f'r{rnd} blocking(ckpts)={t1-t0:5.2f}s  +v-consumer={t2-t1:5.2f}s  full-query={t3-t2:5.2f}s load={os.getloadavg()[0]:.1f}', flush=True)

# candidate_recs dissection
from bigdata_jobmatching_spark.plans.domain_queries import (
    _tiered_offers, _tiered_cvs, _candidate_recs, _PREFILTER_DF_MIN, _PREFILTER_DF_FRAC,
    _RECS_POOL, _RECS_K, _RECS_LAM)
import bigdata_jobmatching_spark.operators.matching as M
from pyspark.sql import Window
from bigdata_jobmatching_spark.operators import similarity_search as ANN

noop(_candidate_recs(spark, SFW))

def recs_stages():
    ts = [time.time()]
    offers = _tiered_offers(spark, SF).localCheckpoint(eager=True)
    ts.append(time.time())
    cvs = _tiered_cvs(spark, SF)
    m = M.match_offers_cvs_prefiltered(
        offers, cvs, max_skill_df=_PREFILTER_DF_MIN, max_skill_df_frac=_PREFILTER_DF_FRAC,
        partition_pairs_by='cv_id')
    rel = m.select(F.col('candidate_id').alias('query_id'), F.col('job_id').alias('vec_id_'),
                   F.floor(F.col('match_score') * 1_000_000 + F.lit(0.5)).cast('long').alias('rel'))
    wp = Window.partitionBy('query_id').orderBy(F.desc('rel'), F.asc('vec_id_'))
    pool = (rel.withColumn('rn', F.row_number().over(wp))
            .filter(F.col('rn') <= _RECS_POOL).drop('rn')).localCheckpoint(eager=True)
    ts.append(time.time())
    osk = F.broadcast(offers.select('job_id', F.array_distinct('skills').alias('skills')))
    pa = pool.select('query_id', F.col('vec_id_').alias('a'))
    pb = pool.select('query_id', F.col('vec_id_').alias('b'))
    sims = (pa.join(pb, 'query_id').filter(F.col('a') != F.col('b'))
        .join(osk.select(F.col('job_id').alias('a'), F.col('skills').alias('sa')), 'a')
        .join(osk.select(F.col('job_id').alias('b'), F.col('skills').alias('sb')), 'b')
        .withColumn('inter', F.size(F.array_intersect('sa', 'sb')).cast('long'))
        .withColumn('uni', (F.size('sa') + F.size('sb')).cast('long') - F.col('inter'))
        .select('query_id', 'a', 'b', F.expr('(inter * 2000000 + uni) div (2 * uni)').alias('sim'))
    ).localCheckpoint(eager=True)
    ts.append(time.time())
    out = ANN.mmr_greedy(pool, sims, k=_RECS_K, lam=_RECS_LAM).select(
        F.col('query_id').alias('candidate_id'), 'rnk', F.col('vec_id_').alias('job_id'), 'rel', 'score')
    noop(out)
    ts.append(time.time())
    d = [ts[i+1]-ts[i] for i in range(len(ts)-1)]
    print(f'  offers={d[0]:5.2f} match+pool={d[1]:5.2f} sims={d[2]:5.2f} mmr={d[3]:5.2f} total={ts[-1]-ts[0]:5.2f} load={os.getloadavg()[0]:.1f}', flush=True)

for rnd in range(3):
    recs_stages()
spark.stop()
