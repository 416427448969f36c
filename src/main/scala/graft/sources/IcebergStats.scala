package graft.sources

import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._

/** Per-file column statistics for the Iceberg interop layer — the
  * manifest `data_file` maps `value_counts` (field-id 109),
  * `null_value_counts` (110), `lower_bounds` (125) and `upper_bounds`
  * (128), keyed by Iceberg FIELD ID with values in the spec's
  * single-value binary serialization (Appendix D: little-endian
  * numerics, UTF-8 strings, big-endian unscaled decimals).
  *
  * Write side: [[footerBounds]] derives the maps from a just-written
  * parquet file's FOOTER alone (row-group statistics, no data scan),
  * so every graft-written manifest entry carries bounds any Iceberg
  * engine can skip by. Read side: [[toFileStats]] decodes a foreign
  * (or graft) manifest entry's maps into [[DeltaStats.FileStats]]'
  * normalized comparison domain, so the DELETE/UPDATE/MERGE detection
  * scans reuse [[DeltaStats.mayMatch]]'s conservative pruning — the
  * difference between O(|candidate files|) and O(table) per keyed
  * mutation at 100 TB.
  *
  * Strings longer than 16 characters truncate the way Iceberg's own
  * writers do: the lower bound keeps the 16-char prefix (≤ every value
  * with that prefix), the upper bound increments the last
  * non-surrogate character of the prefix (> every such value); if no
  * character can go up, the upper bound is omitted. Skipping stays
  * conservative end-to-end: unsupported types, NaN/∞ floats, and
  * undecodable bounds simply contribute nothing.
  * Reference surface: 02_iceberg_demo.ipynb's keyed DML relies on the
  * engine's metadata skipping.
  */
private[graft] object IcebergStats {

  /** Stats-indexed column budget (matches [[DeltaStats.MaxIndexedCols]]
    * and Iceberg writers' default behavior of bounding stats width). */
  val MaxIndexedCols = 32

  /** Manifest statistics maps for one data file, keyed by field id. */
  final case class Bounds(valueCounts: Map[Int, Long],
      nullCounts: Map[Int, Long],
      lowers: Map[Int, Array[Byte]],
      uppers: Map[Int, Array[Byte]])

  /** Top-level `name → field id` of an Iceberg schema node. */
  def fieldIdsOf(schemaNode: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    val it = schemaNode.path("fields").elements()
    while (it.hasNext) {
      val f = it.next()
      val id = f.path("id").asInt(-1)
      if (id >= 0) b += f.path("name").asText() -> id
    }
    b.result()
  }

  // ------------------------------------------------- binary encoding

  private def le(n: Int, f: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    f(bb)
    bb.array()
  }

  /** Single-value serialization of a bound, or None when the type (or
    * this particular value — NaN floats, un-incrementable truncated
    * upper strings) can't carry one. `v` is the JVM value parquet
    * footer statistics yield for the column's Spark type. */
  def encodeBound(dt: DataType, v: AnyRef,
      isUpper: Boolean): Option[Array[Byte]] = Try {
    dt match {
      case BooleanType =>
        Some(Array[Byte](
          if (v.asInstanceOf[java.lang.Boolean]) 1.toByte else 0.toByte))
      case ByteType | ShortType | IntegerType =>
        Some(le(4, _.putInt(v.asInstanceOf[Number].intValue())))
      case LongType =>
        Some(le(8, _.putLong(v.asInstanceOf[Number].longValue())))
      case FloatType =>
        val f = v.asInstanceOf[Number].floatValue()
        if (f.isNaN || f.isInfinite) None else Some(le(4, _.putFloat(f)))
      case DoubleType =>
        val d = v.asInstanceOf[Number].doubleValue()
        if (d.isNaN || d.isInfinite) None else Some(le(8, _.putDouble(d)))
      case DateType => // days since epoch, stored as an int
        Some(le(4, _.putInt(v.asInstanceOf[Number].intValue())))
      case TimestampType | TimestampNTZType => // epoch micros
        Some(le(8, _.putLong(v.asInstanceOf[Number].longValue())))
      case t: DecimalType if t.precision <= 18 =>
        // long-backed parquet decimal: minimal big-endian unscaled
        val unscaled = java.math.BigInteger.valueOf(
          v.asInstanceOf[Number].longValue())
        Some(unscaled.toByteArray)
      case StringType =>
        val s = v match {
          case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
          case other => other.toString
        }
        val bounded =
          if (s.length <= 16) Some(s)
          else if (!isUpper) Some(s.substring(0, 16))
          else truncatedUpper(s)
        bounded.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
  }.toOption.flatten

  /** A 16-char prefix with its last incrementable character bumped —
    * strictly greater than every string sharing the full prefix, in
    * code-point (= UTF-8 byte) order. None when every prefix char sits
    * at the surrogate boundary. */
  private[graft] def truncatedUpper(s: String): Option[String] = {
    val cs = s.substring(0, 16).toCharArray
    var i = cs.length - 1
    while (i >= 0) {
      if (cs(i) < 0xD7FF.toChar) {
        cs(i) = (cs(i) + 1).toChar
        return Some(new String(cs, 0, i + 1))
      }
      i -= 1
    }
    None
  }

  /** Decode a bound into [[DeltaStats]]' normalized comparison domain
    * (numeric/date → BigDecimal, string → String, boolean → Boolean).
    * Wrong-length or otherwise undecodable bytes → None (never prune
    * by them). */
  def decodeBound(dt: DataType, bytes: Array[Byte]): Option[Any] = Try {
    def leBuf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    dt match {
      case BooleanType if bytes.length == 1 => Some(bytes(0) != 0.toByte)
      case ByteType | ShortType | IntegerType if bytes.length == 4 =>
        Some(BigDecimal(leBuf.getInt()))
      case LongType if bytes.length == 8 =>
        Some(BigDecimal(leBuf.getLong()))
      case FloatType if bytes.length == 4 =>
        val f = leBuf.getFloat()
        if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toDouble))
      case DoubleType if bytes.length == 8 =>
        val d = leBuf.getDouble()
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case DateType if bytes.length == 4 => Some(BigDecimal(leBuf.getInt()))
      case TimestampType | TimestampNTZType if bytes.length == 8 =>
        Some(BigDecimal(leBuf.getLong())) // epoch micros
      case t: DecimalType if bytes.nonEmpty =>
        Some(BigDecimal(new java.math.BigDecimal(
          new java.math.BigInteger(bytes), t.scale)))
      case StringType =>
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
  }.toOption.flatten

  // ------------------------------------------------------ write side

  /** The statistics maps for one parquet file, from its footer only:
    * counts and bounds for the first [[MaxIndexedCols]] TOP-LEVEL
    * columns that have a field id and a serializable type. A column
    * whose row-group statistics are absent or unusable contributes
    * counts at most. Returns None when the footer is unreadable —
    * stats are an optimization, never worth failing a commit. */
  def footerBounds(conf: Configuration, file: HPath, schema: StructType,
      idOf: Map[String, Int]): Option[Bounds] =
    footerBoundsCount(conf, file, schema, idOf).map(_._2)

  /** [[footerBounds]] plus the footer's total record count — ONE
    * footer read for both (manifest entries need `record_count` and
    * the statistics maps together). */
  def footerBoundsCount(conf: Configuration, file: HPath,
      schema: StructType, idOf: Map[String, Int])
      : Option[(Long, Bounds)] = Try {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val vc = Map.newBuilder[Int, Long]
      val nc = Map.newBuilder[Int, Long]
      val lo = Map.newBuilder[Int, Array[Byte]]
      val hi = Map.newBuilder[Int, Array[Byte]]
      schema.fields.take(MaxIndexedCols).foreach { f =>
        idOf.get(f.name).foreach { id =>
          val chunks = blocks.flatMap(_.getColumns.asScala.find { c =>
            val p = c.getPath.toArray
            p.length == 1 && p(0) == f.name
          })
          if (chunks.size == blocks.size && blocks.nonEmpty) {
            vc += id -> numRecords // top-level column: one value per row
            val stats = chunks.map(_.getStatistics)
            // Timestamp footer values carry bounds only when the file's
            // logical type declares the unit; normalize to epoch micros
            // (the spec's serialization domain). See DeltaStats.tsToMicros.
            val tsConv: Option[(Long, Boolean) => Long] = f.dataType match {
              case TimestampType | TimestampNTZType =>
                DeltaStats.tsToMicros(chunks)
              case _ => Some((v, _) => v)
            }
            def footerVal(s: org.apache.parquet.column.statistics
                .Statistics[_], upper: Boolean): AnyRef = {
              val raw = (if (upper) s.genericGetMax else s.genericGetMin)
                .asInstanceOf[AnyRef]
              f.dataType match {
                case TimestampType | TimestampNTZType =>
                  java.lang.Long.valueOf(tsConv.get(
                    raw.asInstanceOf[Number].longValue, upper))
                case _ => raw
              }
            }
            if (stats.forall(s => s != null && !s.isEmpty)) {
              val nullCount =
                if (stats.forall(_.isNumNullsSet))
                  Some(stats.map(_.getNumNulls).sum)
                else None
              nullCount.foreach(n => nc += id -> n)
              val allNull = nullCount.contains(numRecords)
              if (!allNull && tsConv.isDefined &&
                  stats.forall(_.hasNonNullValue)) {
                val mins = stats.flatMap(s => encodeBound(f.dataType,
                  footerVal(s, upper = false), isUpper = false)
                  .flatMap(b => decodeBound(f.dataType, b).map((b, _))))
                val maxs = stats.flatMap(s => encodeBound(f.dataType,
                  footerVal(s, upper = true), isUpper = true)
                  .flatMap(b => decodeBound(f.dataType, b).map((b, _))))
                // every row group must contribute, else bounds are
                // partial and unsound
                if (mins.size == stats.size && maxs.size == stats.size) {
                  lo += id -> mins.minBy(_._2)(boundOrdering)._1
                  hi += id -> maxs.maxBy(_._2)(boundOrdering)._1
                }
              }
            }
          }
        }
      }
      (numRecords, Bounds(vc.result(), nc.result(), lo.result(), hi.result()))
    } finally reader.close()
  }.toOption

  private val boundOrdering: Ordering[Any] = (a: Any, b: Any) =>
    (a, b) match {
      case (x: BigDecimal, y: BigDecimal) => x.compare(y)
      case (x: String, y: String) => x.compareTo(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case _ => throw new IllegalStateException("incomparable bounds")
    }

  // ------------------------------------------- in-flight write side

  /** Compact one-line codec for the in-flight write-task payload:
    * record count + statistics maps (binary bounds base64-encoded) —
    * the string each write task ships to the driver with its commit
    * message. */
  def encodePayload(recordCount: Long, bounds: Bounds): String = {
    val b64 = java.util.Base64.getEncoder
    def longs(m: Map[Int, Long]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    def bins(m: Map[Int, Array[Byte]]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"${b64.encodeToString(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"n":$recordCount,"vc":${longs(bounds.valueCounts)},""" +
      s""""nc":${longs(bounds.nullCounts)},"lo":${bins(bounds.lowers)},""" +
      s""""hi":${bins(bounds.uppers)}}"""
  }

  def decodePayload(s: String): Option[(Long, Bounds)] = Try {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(s)
    val b64 = java.util.Base64.getDecoder
    def longs(name: String): Map[Int, Long] = {
      val b = Map.newBuilder[Int, Long]
      val it = root.path(name).fields()
      while (it.hasNext) {
        val e = it.next(); b += e.getKey.toInt -> e.getValue.asLong()
      }
      b.result()
    }
    def bins(name: String): Map[Int, Array[Byte]] = {
      val b = Map.newBuilder[Int, Array[Byte]]
      val it = root.path(name).fields()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey.toInt -> b64.decode(e.getValue.asText())
      }
      b.result()
    }
    (root.path("n").asLong(),
      Bounds(longs("vc"), longs("nc"), bins("lo"), bins("hi")))
  }.toOption

  /** Distributed parquet write with IN-FLIGHT manifest statistics:
    * writes `df` under `dir` (hive layout from `partCols`) and
    * returns relPath → (recordCount, Bounds), each derived by the
    * write task from the footer it just closed — no post-write driver
    * footer re-reads (at a 1000-file commit on an object store that
    * pass is thousands of serialized round-trips). `schema` is the
    * DATA columns the files carry (hive-stripped transform columns
    * excluded). A file whose payload went missing is repaired with
    * one driver footer read, so manifest stats never regress. */
  def writeWithBounds(df: org.apache.spark.sql.DataFrame, dir: String,
      partCols: Seq[String], schema: StructType, idOf: Map[String, Int])
      : Map[String, (Long, Bounds)] = {
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    val fn = new StatsWriteBridge.FooterPayload {
      def apply(conf: Configuration, file: HPath): Option[String] =
        footerBoundsCount(conf, file, schema, idOf)
          .map { case (n, b) => encodePayload(n, b) }
    }
    val collected =
      StatsWriteBridge.writeWithPayloads(df, dir, partCols, fn)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new HPath(dir)
    val fs = root.getFileSystem(conf)
    def list(d: HPath, rel: String): Seq[String] =
      fs.listStatus(d).toSeq.flatMap { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if ((name.startsWith("_") || name.startsWith(".")) &&
            !name.contains("=")) Nil
        else if (st.isDirectory) list(st.getPath, childRel)
        else if (name.endsWith(".parquet")) Seq(childRel)
        else Nil
      }
    val decoded = collected.flatMap { case (rel, payload) =>
      decodePayload(payload).map(rel -> _)
    }
    val missing = list(root, "").filterNot(decoded.contains)
    decoded ++ missing.flatMap(rel =>
      footerBoundsCount(conf, new HPath(root, rel), schema, idOf)
        .map(rel -> _))
  }

  /** (recordCount, Bounds) for PRE-EXISTING files — the convert/
    * registration paths, where there is no write to collect from:
    * distributed as one Spark map job above a small-file threshold
    * (a 100k-file convert reads footers where the executors are, not
    * through one driver), driver reads below it. Keys are the input
    * keys. */
  def boundsScan(spark: org.apache.spark.sql.SparkSession,
      files: Seq[(String, HPath)], schema: StructType,
      idOf: Map[String, Int]): Map[String, (Long, Bounds)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (files.size < 64)
      return files.flatMap { case (k, p) =>
        footerBoundsCount(conf, p, schema, idOf).map(k -> _)
      }.toMap
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    StatsWriteBridge.mapFiles(spark, conf,
      files.map { case (k, p) => k -> p.toString },
      new StatsWriteBridge.FooterPayload {
        def apply(c: Configuration, file: HPath): Option[String] =
          footerBoundsCount(c, file, schema, idOf)
            .map { case (n, b) => encodePayload(n, b) }
      }).flatMap { case (k, s) => decodePayload(s).map(k -> _) }
  }

  /** Row counts for PRE-EXISTING files, distributed above the same
    * small-file threshold as [[boundsScan]]. */
  def countsScan(spark: org.apache.spark.sql.SparkSession,
      files: Seq[(String, HPath)]): Map[String, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def count(c: Configuration, file: HPath): Option[Long] = Try {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, c))
      try rdr.getRecordCount finally rdr.close()
    }.toOption
    if (files.size < 64)
      return files.flatMap { case (k, p) =>
        count(conf, p).map(k -> _) }.toMap
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    StatsWriteBridge.mapFiles(spark, conf,
      files.map { case (k, p) => k -> p.toString },
      new StatsWriteBridge.FooterPayload {
        def apply(c: Configuration, file: HPath): Option[String] =
          count(c, file).map(_.toString)
      }).flatMap { case (k, s) => Try(s.toLong).toOption.map(k -> _) }
  }

  /** Distributed parquet write collecting only each file's ROW COUNT
    * in-flight (position/equality delete files: their manifest entries
    * need `record_count`; column bounds are not emitted for them).
    * Returns relPath → row count for every written file. */
  def writeWithCounts(df: org.apache.spark.sql.DataFrame, dir: String)
      : Map[String, Long] = {
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    val fn = new StatsWriteBridge.FooterPayload {
      def apply(conf: Configuration, file: HPath): Option[String] = Try {
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(file, conf))
        try rdr.getRecordCount.toString finally rdr.close()
      }.toOption
    }
    StatsWriteBridge.writeWithPayloads(df, dir, Nil, fn)
      .flatMap { case (rel, s) => Try(s.toLong).toOption.map(rel -> _) }
  }

  // ------------------------------------------------------- read side

  /** Decode a manifest entry's statistics maps into the shape
    * [[DeltaStats.mayMatch]] prunes by. `recordCount` is the entry's
    * `record_count`; a column decodes only when its field id maps to a
    * top-level schema column of a comparable type. Returns None when
    * the entry carries no usable bounds or counts at all. */
  def toFileStats(schema: StructType, idOf: Map[String, Int],
      recordCount: Long, nullCounts: Map[Int, Long],
      lowers: Map[Int, Array[Byte]], uppers: Map[Int, Array[Byte]])
      : Option[DeltaStats.FileStats] = {
    val nameOf: Map[Int, StructField] = schema.fields.flatMap(f =>
      idOf.get(f.name).map(_ -> f)).toMap
    def decoded(m: Map[Int, Array[Byte]]): Map[String, Any] =
      m.flatMap { case (id, bytes) =>
        nameOf.get(id).flatMap(f =>
          decodeBound(f.dataType, bytes).map(f.name -> _))
      }
    val min = decoded(lowers)
    val max = decoded(uppers)
    val nulls = nullCounts.flatMap { case (id, n) =>
      nameOf.get(id).map(_.name -> n)
    }
    if (min.isEmpty && max.isEmpty && nulls.isEmpty) None
    else Some(DeltaStats.FileStats(Some(recordCount), min, max, nulls))
  }
}
