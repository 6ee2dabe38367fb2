"""Smoke test for the PySpark wrapper (python/graft.py).

Not part of `sbt test` — requires a python with pyspark installed and
the compiled graft classes (sbt compile) on the driver classpath:

    python3 python/smoke_test.py
"""
import os, sys, glob, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from pyspark.sql import SparkSession
spark = (SparkSession.builder
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.driver.extraClassPath", "/root/repo/target/scala-2.13/classes")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import graft

# collect: pandas output, entity filter, column projection
pdf = graft.collect("blocks", spark=spark, source_dir="/root/repo/fixtures/chain",
                    blocks="1000:1010", columns=["block_number", "gas_used"])
assert list(pdf.columns) == ["block_number", "gas_used"], pdf.columns
assert len(pdf) == 10, len(pdf)

# collect: spark output + u256 options
df = graft.collect("logs", spark=spark, source_dir="/root/repo/fixtures/chain",
                   blocks="1000:1060", output_format="spark")
assert df.count() == 194, df.count()

# freeze: files + result dict
out = tempfile.mkdtemp(prefix="graft_py")
res = graft.freeze("blocks", "transactions", spark=spark,
                   source_dir="/root/repo/fixtures/chain", output_dir=out,
                   blocks="1000:1060", chunk_size=60, no_verbose=True)
assert len(res["completed"]) == 2, res
assert res["rows"] > 0
assert glob.glob(out + "/*__blocks__*.parquet")

# pipeline: any registered driver query from Python
dedup = graft.pipeline("q_doc_dedup_exact", "/root/testdata/sf0.001",
                       spark=spark, output_format="pandas")
assert len(dedup) > 0 and "canonical_id" in dedup.columns, dedup.columns
fees = graft.pipeline("chain_fee_analytics", "/root/testdata/sf0.001",
                      spark=spark)
assert fees.count() > 0

# index lifecycle: build once, search the persisted artifacts
idx = tempfile.mkdtemp(prefix="graft_pyidx")
graft.index_build("/root/testdata/sf0.001", idx, spark=spark)
assert glob.glob(idx + "/codes.parquet/*"), "codes not written"
res_dir = tempfile.mkdtemp(prefix="graft_pyres") + "/res"
graft.index_search("/root/testdata/sf0.001", idx, spark=spark, out=res_dir)
found = spark.read.parquet(res_dir)
assert found.count() == 30, found.count()
print("PYSMOKE OK")
spark.stop()
