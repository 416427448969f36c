"""graft — Python surface for the graft Spark analytics engine.

The reference lakehouse's users work from pyspark notebooks backed by an
importable module (reference: modules/dst_metrics/, connector.py); this
package is the same shape for graft:

    import sys; sys.path.insert(0, "<repo>/python")
    from graft import connect, ops, metrics, table

    spark = connect(app_name="curation")        # session + jar + extensions
    docs = spark.read.parquet(".../documents.parquet")
    pairs = ops.minhash_pairs(docs, "doc_id", "text", threshold=0.8)
    clusters = ops.near_dup_clusters(pairs, "doc_a", "doc_b")
    kept = ops.apply_dedup(docs, "doc_id", clusters)

Everything delegates to the Scala library through the active session's
JVM gateway — no logic lives on the Python side, so results are
identical to the Scala/SQL surface.
"""
from .connector import connect, find_jar
from . import metrics, ops, table

__all__ = ["connect", "find_jar", "metrics", "ops", "table"]
