package graft.tools

/** Micro-probe: cost of serializing the Hadoop Configuration (what
  * every per-job SerializableConfiguration broadcast pays) with and
  * without per-property source tracking. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("confprobe", 4)
    val conf = spark.sessionState.newHadoopConf()
    def serialize(c: org.apache.hadoop.conf.Configuration): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      c.write(out); out.flush(); bos.size()
    }
    def time(label: String, c: org.apache.hadoop.conf.Configuration): Unit = {
      serialize(c) // warm
      val t0 = System.nanoTime()
      var n = 0
      (1 to 50).foreach(_ => n += serialize(c))
      println(f"$label: ${(System.nanoTime() - t0) / 50e6}%.2f ms/write, ${n / 50} bytes")
    }
    println(s"props: ${conf.size()}")
    time("stock", conf)
    // null out source tracking via a no-op map
    val f = classOf[org.apache.hadoop.conf.Configuration]
      .getDeclaredField("updatingResource")
    f.setAccessible(true)
    println("field type: " + f.getType)
    val noop = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]() {
      override def put(k: String, v: Array[String]): Array[String] = null
      override def putAll(m: java.util.Map[_ <: String, _ <: Array[String]]): Unit = ()
      override def get(k: Object): Array[String] = null
    }
    f.set(conf, noop)
    time("noop-sources", conf)
    // a COPY of the noop-source conf (what newHadoopConfWithOptions does)
    val copy = new org.apache.hadoop.conf.Configuration(conf)
    copy.set("spark.probe.extra", "x")
    time("copy-of-noop", copy)
    // propagation: install on the CONTEXT conf, then check what the SQL
    // layer actually hands to scans/writes
    f.set(spark.sparkContext.hadoopConfiguration, noop)
    time("sessionState.newHadoopConf after install",
      spark.sessionState.newHadoopConf())
    time("newHadoopConfWithOptions after install",
      spark.sessionState.newHadoopConfWithOptions(Map("path" -> "/tmp/x")))
    spark.stop()
  }
}
