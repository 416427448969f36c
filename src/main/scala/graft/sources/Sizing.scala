package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file sizing for COMPUTED rewrites (guide-style 128 MiB file
  * targets).
  *
  * A row-level mutation's survivor set is the output of joins/filters,
  * so its write inherits the shuffle-partition fan-out — a 1,000-row
  * DML rewrite lands 32+ near-empty files whose per-file cost (create,
  * footer, commit rename, and every later scan's open) dominates the
  * lifecycle suite at bench scale; at 100 TB the same rule yields the
  * 128 MiB files readers want. Applied ONLY where the layout is an
  * accident of computation — never to user appends, exports of an
  * existing layout, or clustering rewrites, whose partitioning IS the
  * product.
  *
  * The estimate is Catalyst's `sizeInBytes`, an OVER-estimate of
  * on-disk bytes for scan/filter/project/join write plans (Filter
  * keeps its child's size, joins multiply, in-memory rows are wider
  * than parquet), so the failure mode is "more files than ideal",
  * never an under-parallel write of unexpectedly big data. `coalesce`
  * never increases partition counts, so a huge/unknown estimate is a
  * no-op; no partition-count probe (a `df.rdd` probe would eagerly
  * fire the plan's broadcast jobs).
  */
object Sizing {
  def coalesceForWrite(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf
      .getOption("spark.graft.write.targetFileBytes")
      .map(_.toLong).getOrElse(128L << 20)
    if (target <= 0) return df
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!est.isValidLong) return df
    val n = math.max(1L, (est.toLong + target - 1) / target)
    if (n < Int.MaxValue) df.coalesce(n.toInt) else df
  }
}
