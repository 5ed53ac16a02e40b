import os, sys, time
sys.path.insert(0, '/root/repo')
from bigdata_jobmatching_spark.session import get_spark, default_parallelism
from pyspark.sql import functions as F

spark = get_spark('measure')
spark.sparkContext.setLogLevel('ERROR')
SF = '/root/testdata/sf0.1'

from bigdata_jobmatching_spark.plans.domain_queries import _derived_offers, _derived_cvs
import bigdata_jobmatching_spark.operators.matching as M
from bigdata_jobmatching_spark.operators.matching import _score_pairs

P = default_parallelism()

def build(repart, full=True):
    offers, cvs = _derived_offers(spark, SF), _derived_cvs(spark, SF)
    norm_skills = F.array_distinct(F.transform(F.coalesce(F.col("skills"), F.array()), lambda s: F.lower(F.trim(s))))
    norm_comp = F.array_distinct(F.transform(F.coalesce(F.col("competences"), F.array()), lambda s: F.lower(F.trim(s))))
    o_sk = offers.select("job_id", F.explode(norm_skills).alias("skill"))
    c_sk = cvs.select("cv_id", F.explode(norm_comp).alias("skill"))
    if repart:
        o_sk = o_sk.repartition(P, "job_id")
    shared = o_sk.join(c_sk, "skill").groupBy("job_id", "cv_id").agg(F.count(F.lit(1)).alias("n_shared"))
    if not full:
        return shared
    o_dim = offers.select(
        "job_id",
        F.size(norm_skills).alias("n_offer_skills"),
        F.col("localisation_id").alias("o_loc"),
        "salaire_min", "salaire_max",
        F.col("niveau_experience").alias("o_exp"),
    )
    c_dim = cvs.select(
        "cv_id",
        F.col("localisation_souhaitee_id").alias("c_loc"),
        F.col("salaire_souhaite"),
        F.col("annees_experience"),
    )
    pairs = shared.join(o_dim, "job_id").join(F.broadcast(c_dim), "cv_id")
    return _score_pairs(pairs)

def t(name, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn().write.format('noop').mode('overwrite').save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f'{name:40s} {best:6.2f}s')
    return best

# warm both shapes at sf0.001
for r in (False, True):
    offers, cvs = _derived_offers(spark, '/root/testdata/sf0.001'), _derived_cvs(spark, '/root/testdata/sf0.001')
build(False, full=True)  # just construct
build(True, full=True)

import bigdata_jobmatching_spark.plans.domain_queries as DQ
DQ._matching(spark, '/root/testdata/sf0.001').write.format('noop').mode('overwrite').save()

# interleaved min-of-3
for rnd in range(3):
    for name, rep in (('agg old', False), ('agg new-repart', True)):
        t0 = time.time()
        build(rep, full=False).write.format('noop').mode('overwrite').save()
        print(f'round{rnd} {name:20s} {time.time()-t0:6.2f}s')
    for name, rep in (('full old', False), ('full new-repart', True)):
        t0 = time.time()
        build(rep, full=True).write.format('noop').mode('overwrite').save()
        print(f'round{rnd} {name:20s} {time.time()-t0:6.2f}s')

# plan check: exchanges in new shape
import io
from contextlib import redirect_stdout
buf = io.StringIO()
with redirect_stdout(buf):
    build(True, full=True).explain('formatted')
plan = buf.getvalue()
print('new plan Exchange count:', plan.count('Exchange'), ' (of which broadcast:', plan.count('BroadcastExchange'), ')')
buf2 = io.StringIO()
with redirect_stdout(buf2):
    build(False, full=True).explain('formatted')
plan2 = buf2.getvalue()
print('old plan Exchange count:', plan2.count('Exchange'), ' (of which broadcast:', plan2.count('BroadcastExchange'), ')')
spark.stop()
