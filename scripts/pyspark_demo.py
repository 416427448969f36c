#!/usr/bin/env python3
"""Notebook-style pyspark tour of the graft data-curation surface.

The reference lakehouse's users live in pyspark notebooks
(reference: docker/spark-notebook/*.ipynb); this script is the same
workflow against graft: SparkSession + the graft jar + GraftExtensions,
then dedup / clustering / decontamination through the public
`graft.api.GraftOps` entry points (via the JVM gateway) and the
SQL-registered native expressions (fingerprint64, dot_product,
array_eq_fraction) through plain `spark.sql`.

Usage (from the repo root):
    sbt package                                  # builds the graft jar
    python3 scripts/pyspark_demo.py [sf_dir]     # default sf0.001

Every step prints a small sample; total runtime is a few seconds at
sf0.001.
"""
import glob
import os
import sys

from pyspark.sql import DataFrame, SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
jars = sorted(glob.glob("target/scala-2.13/*.jar"))
if not jars:
    sys.exit("no graft jar under target/scala-2.13 - run `sbt package` first")
jar = os.path.abspath(jars[-1])

spark = (
    SparkSession.builder
    .master("local[4]")
    .appName("graft-pyspark-demo")
    .config("spark.jars", jar)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.createOrReplaceTempView("documents")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
emb.createOrReplaceTempView("embeddings")

# The Scala API surface, callable through the JVM gateway. Scala default
# arguments are not synthesized across the gateway - pass every
# parameter explicitly.
ops = spark._jvm.graft.api.GraftOps


def from_jvm(jdf):
    """Wrap a JVM Dataset[Row] returned by GraftOps as a pyspark DataFrame."""
    return DataFrame(jdf, spark)


print("== 1. SQL-native graft expressions (GraftExtensions) ==")
spark.sql(
    "SELECT doc_id, fingerprint64(text) AS fp, length(text) AS n "
    "FROM documents ORDER BY doc_id LIMIT 5"
).show(truncate=False)
spark.sql(
    "SELECT a.vec_id, dot_product(CAST(a.embedding AS ARRAY<DOUBLE>), "
    "CAST(a.embedding AS ARRAY<DOUBLE>)) AS self_dot "
    "FROM embeddings a ORDER BY a.vec_id LIMIT 3"
).show()

print("== 2. MinHash+LSH near-duplicate pairs (the d3 shape) ==")
pairs = from_jvm(ops.minhashPairs(docs._jdf, "doc_id", "text", 0.8))
pairs.createOrReplaceTempView("pairs")
print(f"pairs at J>=0.8: {pairs.count()}")
pairs.orderBy("doc_a", "doc_b").show(5)

print("== 3. Connected components + dedup apply (d7 + p6) ==")
clusters = from_jvm(ops.nearDupClusters(pairs._jdf, "doc_a", "doc_b"))
kept = from_jvm(ops.applyDedup(docs._jdf, "doc_id", clusters._jdf))
print(f"docs: {docs.count()} -> kept after near-dup removal: {kept.count()}")

print("== 4. Bloom decontamination against a benchmark set (p8) ==")
bench = docs.filter("source = 'src0'")
train = docs.filter("source <> 'src0'")
flagged = from_jvm(
    ops.bloomDecontamination(
        train._jdf, bench._jdf, "doc_id", "text", 13, 1 << 20, 5
    )
)
print(f"training docs sharing a 13-gram with the benchmark: {flagged.count()}")
flagged.orderBy("doc_id").show(5)

print("== 5. Exact dedup via SQL over the same session ==")
deduped = from_jvm(ops.exactDedupe(docs._jdf, "doc_id", "text"))
deduped.createOrReplaceTempView("deduped")
spark.sql(
    "SELECT (SELECT COUNT(*) FROM documents) AS total, COUNT(*) AS distinct_docs "
    "FROM deduped"
).show()

print("== 6. Versioned lakehouse table + Delta export, from Python ==")
import tempfile

gt = spark._jvm.graft.sources.GraftTable
table_path = tempfile.mkdtemp(prefix="graft_py_") + "/t"
# Scala default args surface as $default$N static forwarders
no_partitions = getattr(gt, "create$default$4")()
t = gt.create(spark._jsparkSession, table_path, kept._jdf, no_partitions)
t.append(docs.filter("doc_id < 0")._jdf)  # empty append -> new version
print(f"table versions: {t.latestVersion() + 1}, "
      f"rows: {from_jvm(t.read()).count()}")

delta_path = tempfile.mkdtemp(prefix="graft_py_delta_") + "/t"
dx = spark._jvm.graft.sources.DeltaInterop
n_files = dx.exportSnapshot(t, delta_path)
replayed = from_jvm(dx.readDelta(spark._jsparkSession, delta_path))
print(f"delta export: {n_files} data files; replayed rows: {replayed.count()}")
assert replayed.count() == from_jvm(t.read()).count()

# the same Delta table through the SQL catalog's streaming-capable
# sibling: register a graft catalog and tail the ORIGINAL table
spark.conf.set("spark.sql.catalog.pydemo", "graft.sources.v2.GraftCatalog")
spark.conf.set("spark.sql.catalog.pydemo.warehouse",
               tempfile.mkdtemp(prefix="graft_py_wh_"))
spark.sql("CREATE NAMESPACE pydemo.db")
spark.sql("CREATE TABLE pydemo.db.t (doc_id BIGINT, n BIGINT) USING graft")
spark.sql("INSERT INTO pydemo.db.t SELECT doc_id, n_chars FROM documents LIMIT 10")
print(f"catalog table rows: {spark.table('pydemo.db.t').count()}")

spark.stop()
print("demo complete")
