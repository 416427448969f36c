package graft.sources

import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file data-skipping statistics for the Delta interop layer —
  * the protocol's add-action `stats` JSON (`numRecords`, `minValues`,
  * `maxValues`, `nullCount`).
  *
  * Write side: [[footerStats]] derives the JSON from a just-written
  * parquet file's FOOTER alone (row-group statistics; no data scan),
  * so every graft-written add action carries stats any Delta engine
  * can skip by. Read side: [[parse]] + [[mayMatch]] turn a foreign
  * (or graft) table's stats into file pruning for the DELETE/UPDATE/
  * MERGE detection scans — the difference between O(|matched files|)
  * and O(table) per keyed mutation at 100 TB.
  *
  * Skipping is strictly conservative: a file is dropped only when a
  * conjunct of the predicate provably holds for NO row of the file
  * (via min/max/nullCount, or the file's literal partition values);
  * anything unparseable, untyped, or non-ASCII (string min/max order
  * here is Java lexicographic, parquet's is UTF-8 byte order — they
  * agree only on ASCII) keeps the file. Reference surface:
  * 03_delta_demo.ipynb relies on the engine's stats skipping for its
  * keyed DML.
  */
private[graft] object DeltaStats {

  /** Stats-indexed column budget — Delta's own
    * `dataSkippingNumIndexedCols` default. */
  val MaxIndexedCols = 32

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  // ------------------------------------------------------ write side

  /** The `stats` JSON for one parquet file, from its footer only:
    * numRecords always; min/max/nullCount for the first
    * [[MaxIndexedCols]] TOP-LEVEL columns of skippable type (integral,
    * float/double, int-backed decimal, string, boolean, date).
    * Unsupported types and NaN/∞-tainted float columns contribute a
    * nullCount at most. Returns None when the footer is unreadable —
    * stats are an optimization, never worth failing a commit. */
  def footerStats(conf: Configuration, file: HPath,
      dataSchema: StructType): Option[String] = Try {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val indexed = dataSchema.fields.take(MaxIndexedCols)
      val mins = Seq.newBuilder[String]
      val maxs = Seq.newBuilder[String]
      val nulls = Seq.newBuilder[String]
      indexed.foreach { f =>
        val chunks = blocks.flatMap(_.getColumns.asScala.find { c =>
          val p = c.getPath.toArray
          p.length == 1 && p(0) == f.name
        })
        if (chunks.size == blocks.size && blocks.nonEmpty) {
          val stats = chunks.map(_.getStatistics)
          val tsConv: Option[(Long, Boolean) => Long] = f.dataType match {
            case TimestampType | TimestampNTZType => tsToMicros(chunks)
            case _ => Some((v, _) => v)
          }
          if (stats.forall(s => s != null && !s.isEmpty)) {
            val nullCount =
              if (stats.forall(_.isNumNullsSet))
                Some(stats.map(_.getNumNulls).sum)
              else None
            nullCount.foreach(n =>
              nulls += s""""${jsonEscape(f.name)}":$n""")
            val allNull = nullCount.contains(numRecords)
            if (!allNull && tsConv.isDefined &&
                stats.forall(_.hasNonNullValue)) {
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
              val lohi = for {
                los <- Try(stats.map(s => statJson(f.dataType,
                  footerVal(s, upper = false), isUpper = false))).toOption
                his <- Try(stats.map(s => statJson(f.dataType,
                  footerVal(s, upper = true), isUpper = true))).toOption
                lo <- reduceOpt(los, keepMin = true)
                hi <- reduceOpt(his, keepMin = false)
              } yield (lo, hi)
              lohi.foreach { case (lo, hi) =>
                mins += s""""${jsonEscape(f.name)}":${lo._1}"""
                maxs += s""""${jsonEscape(f.name)}":${hi._1}"""
              }
            }
          }
        }
      }
      val parts = Seq(s""""numRecords":$numRecords""") ++
        (if (mins.result().nonEmpty)
           Seq(s""""minValues":{${mins.result().mkString(",")}}""",
             s""""maxValues":{${maxs.result().mkString(",")}}""")
         else Nil) ++
        (if (nulls.result().nonEmpty)
           Seq(s""""nullCount":{${nulls.result().mkString(",")}}""")
         else Nil)
      parts.mkString("{", ",", "}")
    } finally reader.close()
  }.toOption

  /** Micros conversion for a timestamp column's INT64 footer values,
    * from the parquet LOGICAL-TYPE annotation — the footer's raw longs
    * are epoch micros only when the file says TIMESTAMP(MICROS).
    * TIMESTAMP(MILLIS) values (e.g. a foreign converter input, or
    * spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS) are 1000×
    * smaller and TIMESTAMP(NANOS) 1000× larger; trusting them raw
    * would publish bounds ~1000× off and prune LIVE files. Returns
    * None (→ the column contributes no bounds) when the annotation is
    * absent or not a timestamp (bare INT64, INT96). Upper bounds round
    * UP on the lossy nanos→micros path so they stay valid bounds. */
  private[sources] def tsToMicros(
      chunks: Seq[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
      : Option[(Long, Boolean) => Long] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import LogicalTypeAnnotation.TimeUnit
    chunks.headOption
      .map(_.getPrimitiveType.getLogicalTypeAnnotation)
      .collect {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit
      }
      .flatMap {
        case TimeUnit.MICROS => Some((v: Long, _: Boolean) => v)
        case TimeUnit.MILLIS =>
          Some((v: Long, _: Boolean) => Math.multiplyExact(v, 1000L))
        case TimeUnit.NANOS => Some((v: Long, up: Boolean) =>
          if (up) Math.floorDiv(Math.addExact(v, 999L), 1000L)
          else Math.floorDiv(v, 1000L))
        case _ => None
      }
  }

  /** (rendered JSON value, comparable) for one footer min/max value —
    * None (via exception → Try in the caller) kills the column.
    * Timestamp values arrive ALREADY normalized to epoch micros (the
    * caller checked the file's logical-type unit via [[tsToMicros]])
    * and truncate to MILLIS the way Delta's own writer does: the min
    * floors, the max CEILS to the next millisecond so the rendered
    * value stays a valid upper bound. */
  private def statJson(dt: DataType, v: AnyRef,
      isUpper: Boolean): (String, Any) = dt match {
    case TimestampType | TimestampNTZType =>
      val us = v.asInstanceOf[Number].longValue // INT64 epoch micros
      val ms =
        if (isUpper) Math.floorDiv(us + 999L, 1000L)
        else Math.floorDiv(us, 1000L)
      val odt = java.time.Instant.ofEpochMilli(ms)
        .atOffset(java.time.ZoneOffset.UTC)
      val base = odt.toLocalDateTime.format(
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS"))
      val rendered =
        if (dt == TimestampType) s""""${base}Z"""" else s""""$base""""
      (rendered, BigDecimal(ms * 1000L))
    case ByteType | ShortType | IntegerType | LongType =>
      val l = v.asInstanceOf[Number].longValue
      (l.toString, BigDecimal(l))
    case FloatType =>
      val d = v.asInstanceOf[Number].floatValue
      require(!d.isNaN && !d.isInfinite, "unusable float stat")
      (d.toString, BigDecimal(d.toDouble))
    case DoubleType =>
      val d = v.asInstanceOf[Number].doubleValue
      require(!d.isNaN && !d.isInfinite, "unusable double stat")
      (d.toString, BigDecimal(d))
    case t: DecimalType =>
      val unscaled = v.asInstanceOf[Number].longValue
      val bd = BigDecimal(java.math.BigDecimal.valueOf(unscaled, t.scale))
      (bd.bigDecimal.toPlainString, bd)
    case BooleanType =>
      val b = v.asInstanceOf[java.lang.Boolean].booleanValue()
      (b.toString, b)
    case DateType =>
      val days = v.asInstanceOf[Number].intValue
      (s""""${java.time.LocalDate.ofEpochDay(days.toLong)}"""",
        BigDecimal(days))
    case StringType =>
      val s = v.asInstanceOf[org.apache.parquet.io.api.Binary]
        .toStringUsingUTF8
      (s""""${jsonEscape(s)}"""", s)
    case other =>
      throw new IllegalArgumentException(s"no stats for ${other.simpleString}")
  }

  /** Min (or max) across row groups of (rendered, comparable) pairs. */
  private def reduceOpt(vs: Seq[(String, Any)],
      keepMin: Boolean): Option[(String, Any)] =
    vs.reduceLeftOption { (a, b) =>
      val c = cmp(a._2, b._2)
      if ((c <= 0) == keepMin) a else b
    }

  /** Distributed parquet write with IN-FLIGHT stats: writes `df`
    * under `staging` (hive layout from `partCols`, like
    * `df.write.partitionBy(...).parquet(...)`) and returns
    * relPath → stats JSON derived by each WRITE TASK from the footer
    * it just closed — the same bytes [[footerStats]] yields, without
    * a post-write driver re-read pass (at a 1000-file commit on an
    * object store, that pass is thousands of serialized round-trips
    * through one machine). A file whose payload went missing (an
    * exotic committer staging layout the task-side path mapping
    * didn't recognize) is repaired with one driver footer read, so
    * stats coverage never regresses. */
  def writeWithStats(df: org.apache.spark.sql.DataFrame, staging: String,
      partCols: Seq[String], dataSchema: StructType): Map[String, String] = {
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    val fn = new StatsWriteBridge.FooterPayload {
      def apply(conf: Configuration, file: HPath): Option[String] =
        footerStats(conf, file, dataSchema)
    }
    val collected =
      StatsWriteBridge.writeWithPayloads(df, staging, partCols, fn)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new HPath(staging)
    val fs = root.getFileSystem(conf)
    def list(dir: HPath, rel: String): Seq[String] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if ((name.startsWith("_") || name.startsWith(".")) &&
            !name.contains("=")) Nil
        else if (st.isDirectory) list(st.getPath, childRel)
        else if (name.endsWith(".parquet")) Seq(childRel)
        else Nil
      }
    val missing = list(root, "").filterNot(collected.contains)
    collected ++ missing.flatMap(rel =>
      footerStats(conf, new HPath(root, rel), dataSchema).map(rel -> _))
  }

  /** Footer stats for PRE-EXISTING files (the convert paths — no
    * write to collect from): distributed as one Spark map job above a
    * small-file threshold (a 100k-file convert reads footers where
    * the executors are, not through one driver), driver thread pool
    * below it (job overhead dominates). Returns relPath → stats JSON. */
  def footerStatsScan(spark: org.apache.spark.sql.SparkSession,
      files: Seq[(String, HPath)], dataSchema: StructType)
      : Map[String, String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (files.size < 64) return footerStatsAll(conf, files, dataSchema)
    import org.apache.spark.sql.graftbridge.StatsWriteBridge
    StatsWriteBridge.mapFiles(spark, conf,
      files.map { case (rel, p) => rel -> p.toString },
      new StatsWriteBridge.FooterPayload {
        def apply(c: Configuration, file: HPath): Option[String] =
          footerStats(c, file, dataSchema)
      })
  }

  /** Footer stats for many files through a bounded local thread pool
    * (footers are KB-scale metadata; the parallelism hides per-file
    * open latency on remote stores). Returns relPath → stats JSON. */
  def footerStatsAll(conf: Configuration, files: Seq[(String, HPath)],
      dataSchema: StructType): Map[String, String] = {
    if (files.isEmpty) return Map.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[Option[(String, String)]]] =
        files.map { case (rel, p) =>
          (() => footerStats(conf, p, dataSchema).map(rel -> _)):
            java.util.concurrent.Callable[Option[(String, String)]]
        }
      pool.invokeAll(tasks.asJava).asScala.flatMap(_.get()).toMap
    } finally pool.shutdown()
  }

  /** Just the `numRecords` of a stats JSON — the row-tracking commit
    * paths need per-file record counts without a schema in hand. */
  def numRecordsOf(json: String): Option[Long] = Try {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(json).path("numRecords")
    if (n.isNumber) Some(n.asLong()) else None
  }.toOption.flatten

  // ------------------------------------------------------- read side

  /** Parsed per-file stats in the normalized comparison domain:
    * numeric/date → BigDecimal (dates as epoch days), string → String,
    * boolean → Boolean. */
  final case class FileStats(numRecords: Option[Long],
      min: Map[String, Any], max: Map[String, Any],
      nullCount: Map[String, Long])

  /** Comparison family of a column type: 'n' numeric (incl. decimal,
    * and timestamps as epoch micros — Iceberg bounds decode to that
    * domain; Delta's ISO-string stats JSON stays unparsed → no prune),
    * 'd' date, 's' string, 'b' boolean. Unsupported → None (never
    * prune by that column). */
  private[sources] def familyOf(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType | TimestampType | TimestampNTZType =>
      Some('n')
    case StringType => Some('s')
    case BooleanType => Some('b')
    case DateType => Some('d')
    case _ => None
  }

  /** Parse a stats JSON against the declared schema; any malformed
    * piece drops just that piece (missing stats never fail a read). */
  def parse(json: String, schema: StructType): Option[FileStats] = Try {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val numRecords =
      if (root.path("numRecords").isNumber)
        Some(root.path("numRecords").asLong()) else None
    def section(name: String): Map[String, Any] =
      schema.fields.flatMap { f =>
        val node = root.path(name).path(f.name)
        normNode(f.dataType, node).map(f.name -> _)
      }.toMap
    val nulls = schema.fields.flatMap { f =>
      val node = root.path("nullCount").path(f.name)
      if (node.isNumber) Some(f.name -> node.asLong()) else None
    }.toMap
    FileStats(numRecords, section("minValues"), section("maxValues"), nulls)
  }.toOption

  /** One JSON stats value → normalized domain, by column type.
    * Timestamps arrive as the protocol's ISO-8601 strings (with or
    * without a zone suffix) and normalize to epoch micros — the domain
    * timestamp LITERALS already compare in. */
  private def normNode(dt: DataType,
      node: com.fasterxml.jackson.databind.JsonNode): Option[Any] =
    if (node == null || node.isMissingNode || node.isNull) None
    else dt match {
      case TimestampType | TimestampNTZType if node.isTextual =>
        Try {
          val s = node.asText()
          val instant = Try(java.time.OffsetDateTime.parse(s).toInstant)
            .getOrElse(java.time.LocalDateTime.parse(s)
              .toInstant(java.time.ZoneOffset.UTC))
          BigDecimal(Math.multiplyExact(instant.getEpochSecond, 1000000L) +
            instant.getNano / 1000L)
        }.toOption
      case _ => familyOf(dt).flatMap {
        case 'n' if node.isNumber => Some(BigDecimal(node.decimalValue()))
        case 'd' if node.isTextual =>
          Try(BigDecimal(
            java.time.LocalDate.parse(node.asText()).toEpochDay)).toOption
        case 's' if node.isTextual => Some(node.asText())
        case 'b' if node.isBoolean => Some(node.asBoolean())
        case _ => None
      }
    }

  /** A Literal → normalized domain, relative to the COLUMN's family
    * (string literals against numeric/date columns parse; anything
    * else mismatched → None, never prune). */
  private def normLit(fam: Char, l: Literal): Option[Any] =
    if (l.value == null) None
    else (fam, l.dataType) match {
      case ('n', ByteType | ShortType | IntegerType | LongType) =>
        Some(BigDecimal(l.value.asInstanceOf[Number].longValue))
      case ('n', FloatType) =>
        val f = l.value.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toDouble))
      case ('n', DoubleType) =>
        val d = l.value.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
      case ('n', _: DecimalType) =>
        Some(l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toBigDecimal)
      case ('n', TimestampType | TimestampNTZType) => // epoch micros
        Some(BigDecimal(l.value.asInstanceOf[Long]))
      case ('n', StringType) => Try(BigDecimal(l.value.toString)).toOption
      case ('s', StringType) => Some(l.value.toString)
      case ('b', BooleanType) => Some(l.value.asInstanceOf[Boolean])
      case ('d', DateType) =>
        Some(BigDecimal(l.value.asInstanceOf[Int].toLong))
      case ('d', StringType) =>
        Try(BigDecimal(
          java.time.LocalDate.parse(l.value.toString).toEpochDay)).toOption
      case _ => None
    }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** Normalized-domain compare; strings must both be ASCII (checked by
    * the caller) so Java order equals parquet's byte order. */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalStateException(
      s"incomparable stat domains: ${a.getClass} vs ${b.getClass}")
  }

  /** Delta canonical partition-value string → normalized domain. */
  private def normPartValue(fam: Char, v: String): Option[Any] =
    fam match {
      case 'n' => Try(BigDecimal(v)).toOption
      case 's' => Some(v)
      case 'b' => v.toLowerCase match {
        case "true" => Some(true); case "false" => Some(false)
        case _ => None
      }
      case 'd' =>
        Try(BigDecimal(java.time.LocalDate.parse(v).toEpochDay)).toOption
    }

  /** Flatten a predicate's AND tree into RESOLVED conjuncts — pruning
    * may use any subset of them soundly. Spark 4 Columns carry lazy
    * ColumnNodes, so the predicate is analyzed against an empty
    * DataFrame of the table schema (driver-only, no job) to obtain
    * plain Catalyst comparisons. Unanalyzable input → no conjuncts →
    * no pruning (the caller's scan then fails or succeeds on its own
    * terms). */
  def conjuncts(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, condition: Column): Seq[Expression] = Try {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    df.filter(condition).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        split(f.condition)
    }.getOrElse(Nil)
  }.getOrElse(Nil)

  /** The column under a comparison side: a bare attribute, or one
    * wrapped in a VALUE-PRESERVING widening cast the analyzer inserted
    * (narrowing/rounding casts — e.g. long→double — are not unwrapped:
    * their ulp edges would make skipping unsound). */
  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case c: Cast =>
      val safe = (c.child.dataType, c.dataType) match {
        case (ByteType | ShortType | IntegerType,
          ShortType | IntegerType | LongType | DoubleType |
          _: DecimalType) => true
        case (LongType, _: DecimalType) => true
        case (FloatType, DoubleType) => true
        case _ => false
      }
      if (safe) attrName(c.child) else None
    case _ => None
  }

  /** May the file hold a row where EVERY conjunct is TRUE? False only
    * on proof of impossibility. `pv` are the file's literal partition
    * values (a partition column is a [v, v] interval, or all-null);
    * `statsJson` the add action's stats if carried. */
  def mayMatch(conjs: Seq[Expression], schema: StructType,
      partCols: Seq[String], pv: Map[String, String],
      statsJson: Option[String]): Boolean =
    mayMatchStats(conjs, schema, partCols, pv,
      statsJson.flatMap(parse(_, schema)))

  /** [[mayMatch]] over already-normalized [[FileStats]] — the shape
    * [[IcebergStats]] decodes manifest bound maps into. By-name so a
    * purely partition-value prune never pays for stats parsing. */
  def mayMatchStats(conjs: Seq[Expression], schema: StructType,
      partCols: Seq[String], pv: Map[String, String],
      fstatsIn: => Option[FileStats]): Boolean = {
    lazy val fstats = fstatsIn

    // (lo, hi, mayBeNull, allNull) in the normalized domain; None
    // components are unknown
    def info(name: String)
        : Option[(Option[Any], Option[Any], Option[Boolean], Boolean)] = {
      val f = schema.fields.find(_.name.equalsIgnoreCase(name))
        .getOrElse(return None)
      val fam = familyOf(f.dataType).getOrElse(return None)
      if (partCols.exists(_.equalsIgnoreCase(f.name))) {
        // An EXPLICIT null value is an all-null partition; a key that is
        // simply absent (protocol violation, or a case-mismatched writer)
        // is UNKNOWN — pruning by it would drop live files.
        pv.find(_._1.equalsIgnoreCase(f.name)) match {
          case Some((_, null)) => Some((None, None, Some(true), true))
          case Some((_, v)) => normPartValue(fam, v) match {
            case Some(n) => Some((Some(n), Some(n), Some(false), false))
            case None => Some((None, None, Some(false), false))
          }
          case None => Some((None, None, None, false))
        }
      } else fstats.map { st =>
        val nc = st.nullCount.get(f.name)
        val allNull = (nc, st.numRecords) match {
          case (Some(n), Some(total)) => n == total && total > 0
          case _ => false
        }
        (st.min.get(f.name), st.max.get(f.name), nc.map(_ > 0), allNull)
      }
    }

    // strings participate only when every compared value is ASCII
    def usable(v: Any): Boolean = v match {
      case s: String => isAscii(s)
      case _ => true
    }

    def litOf(name: String, l: Literal): Option[Any] =
      schema.fields.find(_.name.equalsIgnoreCase(name))
        .flatMap(f => familyOf(f.dataType))
        .flatMap(fam => normLit(fam, l)).filter(usable)

    // does `c` provably hold for NO row of this file?
    def disproved(c: Expression): Boolean = c match {
      case EqualTo(a, l: Literal) => disprovedCmp(a, l, "=")
      case EqualTo(l: Literal, a) => disprovedCmp(a, l, "=")
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        disprovedCmp(a, l, "=")
      case EqualNullSafe(l: Literal, a) if l.value != null =>
        disprovedCmp(a, l, "=")
      case LessThan(a, l: Literal) => disprovedCmp(a, l, "<")
      case LessThan(l: Literal, a) => disprovedCmp(a, l, ">")
      case LessThanOrEqual(a, l: Literal) => disprovedCmp(a, l, "<=")
      case LessThanOrEqual(l: Literal, a) => disprovedCmp(a, l, ">=")
      case GreaterThan(a, l: Literal) => disprovedCmp(a, l, ">")
      case GreaterThan(l: Literal, a) => disprovedCmp(a, l, "<")
      case GreaterThanOrEqual(a, l: Literal) => disprovedCmp(a, l, ">=")
      case GreaterThanOrEqual(l: Literal, a) => disprovedCmp(a, l, "<=")
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attrName(a).exists { name =>
          info(name).exists { case (lo, hi, _, allNull) =>
            allNull || {
              val lits = vs.map(v => litOf(name, v.asInstanceOf[Literal]))
              lits.forall(_.isDefined) && lits.flatten.forall { v =>
                (lo.filter(usable).exists(l => cmp(v, l) < 0)) ||
                  (hi.filter(usable).exists(h => cmp(v, h) > 0))
              }
            }
          }
        }
      case IsNull(a) => attrName(a).exists(name =>
        info(name).exists { case (_, _, mayNull, _) =>
          mayNull.contains(false) })
      case IsNotNull(a) => attrName(a).exists(name =>
        info(name).exists { case (_, _, _, allNull) => allNull })
      case _ => false
    }

    // attr-vs-literal comparison `a op l` impossible for all rows?
    def disprovedCmp(a: Expression, l: Literal, op: String): Boolean =
      attrName(a).exists { name =>
        info(name).exists { case (loOpt, hiOpt, _, allNull) =>
          allNull || litOf(name, l).exists { v =>
            val lo = loOpt.filter(usable)
            val hi = hiOpt.filter(usable)
            op match {
              case "=" =>
                lo.exists(x => cmp(v, x) < 0) || hi.exists(x => cmp(v, x) > 0)
              case "<" => lo.exists(x => cmp(x, v) >= 0)
              case "<=" => lo.exists(x => cmp(x, v) > 0)
              case ">" => hi.exists(x => cmp(x, v) <= 0)
              case ">=" => hi.exists(x => cmp(x, v) < 0)
            }
          }
        }
      }

    conjs.forall(c => !disproved(c))
  }
}
