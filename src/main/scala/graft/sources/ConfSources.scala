package graft.sources

import org.apache.hadoop.conf.Configuration

/** Disable Hadoop Configuration per-property SOURCE TRACKING on a
  * session's context conf.
  *
  * `Configuration.write` serializes, for EVERY property, the array of
  * resources that set it — through `WritableUtils.
  * writeCompressedStringArray`, which allocates a fresh GZIP deflater
  * per property. A 1,100-property conf measured **9–12 ms per
  * serialization vs 0.5–1.0 ms without tracking** (and 40% fewer
  * bytes), and a `SerializableConfiguration` broadcast rides every
  * file scan and every write job — driver stack samples put this at
  * ~25% of the lakehouse gates' driver-side gap time.
  *
  * Source tracking feeds only diagnostics (`getPropertySources`, the
  * "set by" annotations); no Spark or graft runtime path reads it.
  * The no-op map keeps `Configuration.set` working on the patched
  * instance (put is ignored), and every conf COPIED from it (what
  * `sessionState.newHadoopConf*` does per scan/write) starts with an
  * empty real map, so the win propagates to all derived confs —
  * measured 0.5–0.6 ms on session-derived copies after installing on
  * the context conf alone.
  *
  * Reflection-guarded: if the private field is absent or sealed in a
  * future Hadoop, this silently no-ops and the stock cost returns.
  */
object ConfSources {
  private val noopSources =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]() {
      override def put(k: String, v: Array[String]): Array[String] = null
      override def putAll(
          m: java.util.Map[_ <: String, _ <: Array[String]]): Unit = ()
      override def get(k: Object): Array[String] = null
    }

  def disableTracking(conf: Configuration): Unit =
    try {
      val f = classOf[Configuration].getDeclaredField("updatingResource")
      f.setAccessible(true)
      f.set(conf, noopSources)
    } catch { case scala.util.control.NonFatal(_) => () }
}
