import sys, time, io
from contextlib import redirect_stdout
sys.path.insert(0, '/root/repo')
from bigdata_jobmatching_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark('ab')
spark.sparkContext.setLogLevel('ERROR')
SF = '/root/testdata/sf0.1'
SFW = '/root/testdata/sf0.001'

# ---------- semantic_dedup_stats: old dots shape vs new ----------
import bigdata_jobmatching_spark.operators.dedup as D
from bigdata_jobmatching_spark.plans.dedup_queries import _semantic_dedup, _sdd_frames, _SDD_DEC, _SD_K, _SD_SUB_TARGET, _SD_BITS_MAX
from bigdata_jobmatching_spark.sources.io import load_table

def sdd(sf, old):
    e = load_table(spark, sf, 'embeddings')
    parts = D.semantic_blocks(e, 'vec_id', 'embedding', _SD_K, _SD_SUB_TARGET, _SD_BITS_MAX)
    v, asg, norms = parts.v, parts.asg, parts.norms
    F_ = F
    if old:
        a = v.select('cluster', 'sig', F_.col('__id').alias('id_a'), 'j', F_.col('q').alias('qa'))
        b = v.select('cluster', 'sig', F_.col('__id').alias('id_b'), 'j', F_.col('q').alias('qb'))
        dots = (a.join(b, ['cluster', 'sig', 'j'])
                .filter(F_.col('id_a') < F_.col('id_b'))
                .groupBy('cluster', 'id_a', 'id_b')
                .agg(F_.sum(F_.col('qa') * F_.col('qb')).alias('dot')))
    else:
        from bigdata_jobmatching_spark.session import default_parallelism
        vp = v.repartition(default_parallelism(), 'cluster', 'sig')
        a = vp.select('cluster', 'sig', F_.col('__id').alias('id_a'), 'j', F_.col('q').alias('qa'))
        b = vp.select('cluster', 'sig', F_.col('__id').alias('id_b'), 'j', F_.col('q').alias('qb'))
        dots = (a.join(b, ['cluster', 'sig', 'j'])
                .filter(F_.col('id_a') < F_.col('id_b'))
                .groupBy('cluster', 'sig', 'id_a', 'id_b')
                .agg(F_.sum(F_.col('qa') * F_.col('qb')).alias('dot'))
                .drop('sig'))
    tau_num, tau_den = 49, 400
    dec = lambda c: F_.col(c).cast('decimal(38,0)')
    pairs = (dots
        .join(F_.broadcast(norms.select(F_.col('__id').alias('id_a'), F_.col('n2').alias('na'))), 'id_a')
        .join(F_.broadcast(norms.select(F_.col('__id').alias('id_b'), F_.col('n2').alias('nb'))), 'id_b')
        .join(F_.broadcast(asg.select(F_.col('__id').alias('id_a'), F_.col('seed_dist').alias('da'))), 'id_a')
        .join(F_.broadcast(asg.select(F_.col('__id').alias('id_b'), F_.col('seed_dist').alias('db'))), 'id_b')
        .filter((F_.col('dot') >= 0)
                & (dec('dot') * dec('dot') * F_.lit(tau_den).cast('decimal(38,0)')
                   >= dec('na') * dec('nb') * F_.lit(tau_num).cast('decimal(38,0)')))
        .withColumn('drop_id',
                    F_.when(F_.col('db') < F_.col('da'), F_.col('id_b'))
                    .when(F_.col('db') > F_.col('da'), F_.col('id_a'))
                    .otherwise(F_.col('id_b'))))
    pairs = pairs.select('cluster', 'id_a', 'id_b', 'dot', 'da', 'db', 'drop_id')
    per_cluster = parts.asg.groupBy('cluster').agg(F.count(F.lit(1)).cast('long').alias('n_vecs'))
    pair_stats = pairs.groupBy('cluster').agg(
        F.count(F.lit(1)).cast('long').alias('n_pairs'),
        F.sum(_SDD_DEC('dot')).cast('long').alias('sum_pair_dot'),
        F.count_distinct(F.col('drop_id')).cast('long').alias('n_dropped'),
        F.sum_distinct(F.col('drop_id')).cast('long').alias('sum_dropped_ids'))
    out = per_cluster.join(F.broadcast(pair_stats), 'cluster', 'left')
    return out

# ---------- pagerank: old shape vs new ----------
from bigdata_jobmatching_spark.plans.relational_extra2 import copurchase_pairs
from bigdata_jobmatching_spark.operators.graph import pagerank_exact

def pr_old(sf):
    edges = copurchase_pairs(spark, sf)
    src, dst, iterations, scale, damping_pct = 'pa', 'pb', 5, 10**12, 85
    e = edges.select(F.col(src).alias('a'), F.col(dst).alias('b'))
    sym = e.union(e.select(F.col('b').alias('a'), F.col('a').alias('b'))).localCheckpoint(eager=False)
    deg = sym.groupBy(F.col('a').alias('node')).agg(F.count(F.lit(1)).alias('degree')).localCheckpoint(eager=False)
    n = deg.agg(F.count(F.lit(1)).alias('n_nodes'))
    base = (deg.crossJoin(F.broadcast(n))
        .select('node', 'degree',
                F.expr(f'{scale} div n_nodes').alias('rank'),
                F.expr(f'({100 - damping_pct} * ({scale} div n_nodes)) div 100').alias('tele'))
        .localCheckpoint(eager=False))
    ranks = base
    for _ in range(iterations):
        contrib = ranks.select(F.col('node').alias('a'), F.expr('rank div degree').alias('contrib'))
        inflow = (sym.join(contrib, 'a').groupBy(F.col('b').alias('node')).agg(F.sum('contrib').alias('inflow')))
        ranks = (base.select('node', 'degree', 'tele')
            .join(inflow, 'node', 'left')
            .select('node', 'degree', 'tele',
                    (F.col('tele') + F.expr(f'({damping_pct} * coalesce(inflow, 0)) div 100')).alias('rank'))
            .localCheckpoint(eager=False))
    r = ranks.select('node', 'rank')
    return r.orderBy(F.desc('rank'), F.asc('node')).limit(20).select('node', 'rank')

def pr_new(sf):
    pairs = copurchase_pairs(spark, sf)
    ranks = pagerank_exact(pairs, 'pa', 'pb', iterations=5, scale=10**12, damping_pct=85)
    return ranks.orderBy(F.desc('rank'), F.asc('node')).limit(20).select('node', 'rank')

def noop(df):
    df.write.format('noop').mode('overwrite').save()

# warm both shapes
for fn in (lambda: sdd(SFW, True), lambda: sdd(SFW, False), lambda: pr_old(SFW), lambda: pr_new(SFW)):
    noop(fn())

import os
res = {}
for rnd in range(4):
    for name, fn in (('sdd_old', lambda: sdd(SF, True)), ('sdd_new', lambda: sdd(SF, False)),
                     ('pr_old', lambda: pr_old(SF)), ('pr_new', lambda: pr_new(SF))):
        t0 = time.time(); noop(fn()); dt = time.time() - t0
        res.setdefault(name, []).append(dt)
        print(f'r{rnd} {name:8s} {dt:6.2f}s load={os.getloadavg()[0]:.1f}', flush=True)
print({k: round(min(v), 2) for k, v in res.items()})
spark.stop()
