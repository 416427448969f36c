package graft.tools

/** Micro-probe: fixed cost of CONSTRUCTING a multi-file parquet read
  * (DataSource resolution + glob/exists checks + FileIndex + analysis)
  * vs executing it — the constant the Delta DML phases pay per scan. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("readprobe", 32)
    import org.apache.spark.sql.functions._
    // build a 25-file directory like an exported partitioned snapshot
    val dir = java.nio.file.Files.createTempDirectory("readprobe_").toString
    graft.sources.Tables.supplier(spark, "/root/testdata/sf0.1")
      .write.mode("overwrite").partitionBy("s_nationkey").parquet(dir)
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
      .map(_.toString).toSeq
    println(s"files: ${files.size}")
    val schema = spark.read.parquet(files.head).schema
    // warm
    spark.read.schema(schema).parquet(files: _*).count()
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%.1f ms"); r
    }
    (1 to 3).foreach { i =>
      val df = phase(s"construct+analyze $i") {
        val d = spark.read.schema(schema).parquet(files: _*)
        d.queryExecution.executedPlan // force planning
        d
      }
      phase(s"execute count $i") { df.count() }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
