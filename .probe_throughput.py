import sys, time

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F

from grower_spark.session import get_spark
from grower_spark.driver_queries import SYNTH_CONFIG, FIXED_NOW, _synth_lines
from grower_spark.plans.pipeline import LogPipeline

spark = get_spark("throughput")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

# 100k events -> x32 replicas = 3.2M lines, cached so only parse is timed
lines = _synth_lines(spark, "/root/testdata/sf0.1")
big = lines.crossJoin(spark.range(32).select(F.col("id").alias("rep"))).select("value")
big = big.repartition(64).cache()
n = big.count()
print(f"lines: {n}")

for mode in ["single_pass", "per_column"]:
    pipe = LogPipeline(SYNTH_CONFIG, now=F.lit(FIXED_NOW).cast("timestamp"), extract_mode=mode)
    for run in range(2):
        t0 = time.time()
        pipe.parse(big).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{mode} run{run}: {dt:.2f}s = {n/dt/1000:.0f}k lines/s")
spark.stop()
