import sys, time, os
sys.path.insert(0, "/root/repo")
from bigdata_jobmatching_spark.session import get_spark, default_parallelism
from pyspark.sql import functions as F
spark = get_spark("ab-openorders"); spark.sparkContext.setLogLevel("ERROR")
from bigdata_jobmatching_spark.sources.io import load_table
from bigdata_jobmatching_spark.plans.temporal_queries import _M_IDX

def build(sf, mode):
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .select("o_orderkey",
                 F.expr(_M_IDX.format(c="o_orderdate")).alias("s_idx"),
                 F.expr(_M_IDX.format(c="l_shipdate")).alias("e_idx")))
    if mode == "ckpt":
        j = j.localCheckpoint(eager=False)
    elif mode == "repart":
        j = j.repartition(default_parallelism(), "o_orderkey")
    def deltas(df, col):
        cells = F.array(F.struct(F.col("s_idx").alias("idx"), F.lit(1).alias("d")),
                        F.struct(F.col("e_idx").alias("idx"), F.lit(-1).alias("d")))
        return (df.filter(F.col("s_idx") < F.col("e_idx"))
                .select(F.explode(cells).alias("c"))
                .groupBy(F.col("c.idx").alias("idx")).agg(F.sum("c.d").alias(col)))
    line_d = deltas(j, "ld")
    order_d = deltas(j.groupBy("o_orderkey", "s_idx").agg(F.max("e_idx").alias("e_idx")), "od")
    d = (line_d.join(order_d, "idx", "full")
         .select("idx", F.coalesce("ld", F.lit(0)).alias("ld"), F.coalesce("od", F.lit(0)).alias("od")))
    earlier = d.select(F.col("idx").alias("e_i"), F.col("ld").alias("e_ld"), F.col("od").alias("e_od"))
    cum = (d.join(F.broadcast(earlier), F.col("e_i") <= F.col("idx"))
           .groupBy("idx")
           .agg(F.sum("e_ld").alias("open_lines"), F.sum("e_od").alias("open_orders")))
    return cum

def noop(df): df.write.format("noop").mode("overwrite").save()
for m in ("plain", "ckpt", "repart"):
    noop(build("/root/testdata/sf0.001", m))
res = {}
for r in range(4):
    for m in ("plain", "ckpt", "repart"):
        t0=time.time(); noop(build("/root/testdata/sf0.1", m)); dt=time.time()-t0
        res.setdefault(m, []).append(dt)
        print(f"r{r} {m:7s} {dt:5.2f}s load={os.getloadavg()[0]:.1f}", flush=True)
print({k: round(min(v),2) for k,v in res.items()})
spark.stop()
