"""Pipeline metrics from Python — the reference dst_metrics analog
(modules/dst_metrics: build_record / SparkMetricsLogger /
SparkMetricContext), delegating to `graft.metrics` on the JVM so Python
and Scala jobs share one activity log (and the same configured
MetricSinks, e.g. the HTTP/OpenLineage push sink)."""
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame


class MetricsLogger(object):
    """Appends metric records to a parquet activity log; every record is
    also offered to the sinks configured via spark.graft.metrics.sinks."""

    def __init__(self, spark, table_path):
        self._spark = spark
        self.table_path = table_path
        self._j = spark._jvm.graft.metrics.MetricsLogger(
            spark._jsparkSession, table_path)

    def log(self, layer, project, dataset_year, description, value, unit,
            function, job_name=None, run_id=None, status=None,
            duration_ms=None, table_name=None, source_path=None):
        """Log one metric record; returns the run id."""
        return self._j.logRecord(
            layer, project, int(dataset_year), description, float(value),
            unit, function, job_name, run_id, status,
            None if duration_ms is None else int(duration_ms),
            table_name, source_path)

    def read_all(self):
        """The whole activity log through one schema-merged scan."""
        return DataFrame(self._j.readAll(), self._spark)


@contextmanager
def metric_context(spark, table_path, layer, project, dataset_year,
                   description, job_name=None):
    """Context-managed job metrics (reference context.py): one shared
    run_id for every metric logged in the block, plus exactly one
    completion record with status + duration on exit.

        with metric_context(spark, log_path, "gold", "proj", 2024,
                            "nightly curation") as m:
            m.log_metric("rows written", float(n), "rows", "count")
    """
    logger = MetricsLogger(spark, table_path)
    run_id = str(uuid.uuid4())
    start = time.time()

    class _Ctx(object):
        def __init__(self):
            self.run_id = run_id
            self.logger = logger

        def log_metric(self, description, value, unit, function,
                       table_name=None, source_path=None):
            return logger.log(layer, project, dataset_year, description,
                              value, unit, function, job_name=job_name,
                              run_id=run_id, table_name=table_name,
                              source_path=source_path)

    status = "success"
    try:
        yield _Ctx()
    except BaseException:
        status = "failure"
        raise
    finally:
        logger.log(layer, project, dataset_year, description, 1.0, "job",
                   "completion", job_name=job_name, run_id=run_id,
                   status=status,
                   duration_ms=int((time.time() - start) * 1000))
