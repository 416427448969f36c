package graft

import java.nio.file.Files
import graft.metrics._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  import TestSpark._

  test("metric context writes task metrics and a completion record") {
    val dir = Files.createTempDirectory("metrics").toString + "/activity_log"
    val ctx = new MetricContext(spark, dir, layer = "1", project = "demo",
      datasetYear = 2024, description = "bronze ingest", jobName = Some("job1"))
    ctx.run {
      ctx.logMetric("rows ingested", 42.0, "rows", "count",
        tableName = Some("bronze_customers"))
    }
    ctx.close()
    val log = ctx.logger.readAll()
    assert(log.count() == 2)
    val completion = log.filter(log("metric_function") === "completion").collect()
    assert(completion.length == 1)
    assert(completion(0).getAs[String]("status") == "success")
    assert(completion(0).getAs[Long]("duration_ms") >= 0)
    // one shared run_id across the context
    assert(log.select("run_id").distinct().count() == 1)
  }

  test("failure in run() records failure status") {
    val dir = Files.createTempDirectory("metrics").toString + "/activity_log"
    val ctx = new MetricContext(spark, dir, "2", "demo", 2024, "silver clean")
    intercept[RuntimeException] { ctx.run { throw new RuntimeException("boom") } }
    val log = ctx.logger.readAll()
    val completion = log.filter(log("metric_function") === "completion").collect()
    assert(completion.length == 1 && completion(0).getAs[String]("status") == "failure")
  }

  test("metric utils compute counts and averages") {
    import spark.implicits._
    val df = Seq((1, 2.0, true), (2, 4.0, false), (3, 6.0, true))
      .toDF("id", "v", "is_error")
    assert(MetricUtils.dfCount(df) == 3)
    assert(math.abs(MetricUtils.dfAvg(df, "v") - 4.0) < 1e-12)
    assert(MetricUtils.dfErrorCount(df) == 2)
    assert(MetricUtils.dfErrorCount(df.drop("is_error")) == 0)
  }
}
