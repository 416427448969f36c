package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.types._

/** Per-directory column statistics for GraftTable — the commit-log-level
  * min/max metadata Delta/Iceberg keep per file, kept here per data
  * directory (`<dir>/_graft_stats.json`, written once at commit time
  * since directories are immutable).
  *
  * Purpose: metadata-only pruning for row-level mutations. A predicate
  * like `id = 7` or `seg = 'A' AND ts >= …` can skip every directory
  * whose [min,max] range provably excludes it WITHOUT scanning any
  * data — at 100 TB that turns "scan the table to find the dirs to
  * rewrite" into a driver-side metadata decision plus a scan of only
  * the overlapping dirs.
  *
  * Pruning is conservative and lossless: only conjuncts it can prove
  * unsatisfiable eliminate a directory; anything unrecognized keeps it.
  */
object DirStats {

  private val FileName = "_graft_stats.json"

  /** Pseudo-column recording the directory's row count — a dir with no
    * rows satisfies no predicate, so it prunes under any filter. */
  val RowCountKey = "__count"

  /** Key prefix for per-directory Bloom filters (the Delta bloom-filter
    *-index analog): min/max ranges prune RANGE predicates but are
    * useless for point lookups on high-cardinality keys spread across
    * every directory — a per-dir Bloom answers `key = v` with "provably
    * absent" at a fixed bits budget. Opt-in per table via
    * `spark.graft.table.bloomCols` (comma-separated columns), sized by
    * `spark.graft.table.bloomBits` (default 2¹⁷ bits = 16 KB per
    * column per dir). Values are hashed with xxhash64 (seed 42) on the
    * write path; the probe hashes the predicate literal identically,
    * and only when the literal's type equals the column type recorded
    * with the filter (a cast literal would hash differently — kept
    * conservative). */
  val BloomPrefix = "__bloom_"
  private val BloomHashes = 5

  /** kind: "num" (compare as double) | "str" (compare lexicographically —
    * dates/timestamps are stored as ISO strings, which order correctly) |
    * "bloom" (min = base64 bitset, max = the column's catalog type). */
  final case class ColStat(kind: String, min: String, max: String)

  /** Overwrite-put of the stats file via the dir's Hadoop FileSystem
    * (stats are advisory metadata — a torn read is impossible for
    * whole-object stores and merely drops pruning for one dir
    * elsewhere, so no conditional-put ceremony needed). */
  private def put(fs: FileSystem, p: HPath, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** IN-FLIGHT stats payload for [[graftbridge.StatsWriteBridge]]-routed
    * writes: each write TASK renders its just-closed file's row count +
    * per-column bounds from the parquet FOOTER (page-cache hot, read
    * where the data lives), so the commit needs NO second scan of the
    * written data — at 100 TB the difference between one data pass and
    * two per commit. The per-file JSON uses the stats-file grammar, so
    * [[load]]'s parser doubles as the payload parser. */
  final class FooterStatFn(schema: StructType)
      extends org.apache.spark.sql.graftbridge.StatsWriteBridge.FooterPayload {
    def apply(conf: org.apache.hadoop.conf.Configuration,
        file: HPath): Option[String] = footerFileJson(conf, file, schema)
  }

  /** Per-FILE stats JSON from the parquet footer alone: `__count`
    * always; min/max for eligible top-level primitive columns. Bound
    * rendering matches [[write]]'s `cast(... as string)` exactly for
    * the types both paths emit (integrals, float/double via
    * `toString`, long-backed decimals via plain string, dates ISO,
    * timestamps in the session-UTC "yyyy-MM-dd HH:mm:ss[.f]" form).
    * Conservative drops (column contributes no bounds, the dir is
    * kept by any predicate on it): INT96 timestamps (no ordered
    * footer stats), NaN/∞ floats, binary-backed decimals, non-ASCII
    * strings (footer byte order and the pruning comparator agree only
    * on ASCII; parquet's truncated bounds stay valid bounds). */
  private[sources] def footerFileJson(conf: org.apache.hadoop.conf.Configuration,
      file: HPath, schema: StructType): Option[String] = scala.util.Try {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val cols = schema.fields.flatMap { f =>
        val kind = f.dataType match {
          case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
               _: FloatType | _: DoubleType | _: DecimalType => Some("num")
          case _: StringType | _: DateType | _: TimestampType => Some("str")
          case _ => None
        }
        kind.flatMap { k =>
          val chunks = blocks.flatMap(_.getColumns.asScala.find { c =>
            val p = c.getPath.toArray
            p.length == 1 && p(0) == f.name
          })
          if (chunks.size != blocks.size || blocks.isEmpty) None
          else {
            val stats = chunks.map(_.getStatistics)
            val tsConv: Option[(Long, Boolean) => Long] = f.dataType match {
              case TimestampType => DeltaStats.tsToMicros(chunks)
              case _ => Some((v, _) => v)
            }
            if (!stats.forall(s => s != null && !s.isEmpty &&
                s.hasNonNullValue) || tsConv.isEmpty) None
            else scala.util.Try {
              def render(upper: Boolean): Seq[String] = stats.map { s =>
                val raw = (if (upper) s.genericGetMax else s.genericGetMin)
                  .asInstanceOf[AnyRef]
                footerRender(f.dataType, raw, tsConv.get, upper)
              }
              val los = render(upper = false)
              val his = render(upper = true)
              val lo = reduceBound(los, k, keepMin = true)
              val hi = reduceBound(his, k, keepMin = false)
              f.name -> ColStat(k, lo, hi)
            }.toOption
          }
        }
      }
      renderStatsJson((RowCountKey -> ColStat("num", numRecords.toString,
        numRecords.toString)) +: cols.toSeq)
    } finally reader.close()
  }.toOption

  /** One footer value in [[write]]'s `cast-to-string` rendering. A
    * value the rendering cannot represent faithfully throws (caller
    * drops the column — conservative). */
  private def footerRender(dt: DataType, v: AnyRef,
      tsConv: (Long, Boolean) => Long, upper: Boolean): String = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      v.asInstanceOf[Number].longValue.toString
    case FloatType =>
      val f = v.asInstanceOf[Number].floatValue
      require(!f.isNaN && !f.isInfinite, "unusable float bound"); f.toString
    case DoubleType =>
      val d = v.asInstanceOf[Number].doubleValue
      require(!d.isNaN && !d.isInfinite, "unusable double bound"); d.toString
    case t: DecimalType =>
      java.math.BigDecimal.valueOf(v.asInstanceOf[Number].longValue, t.scale)
        .toPlainString
    case DateType =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].intValue.toLong)
        .toString
    case TimestampType =>
      val us = tsConv(v.asInstanceOf[Number].longValue, upper)
      renderTimestampMicros(us)
    case StringType =>
      val s = v.asInstanceOf[org.apache.parquet.io.api.Binary]
        .toStringUsingUTF8
      require(s.forall(_ < 0x80), "non-ASCII string bound"); s
    case other =>
      throw new IllegalArgumentException(s"no stats for ${other.simpleString}")
  }

  /** Bound merge across files/row-groups under the SAME comparator the
    * pruning side uses (num = BigDecimal, str = lexicographic). */
  private def reduceBound(vs: Seq[String], kind: String,
      keepMin: Boolean): String =
    vs.reduceLeft { (a, b) =>
      val c =
        if (kind == "num") new java.math.BigDecimal(a)
          .compareTo(new java.math.BigDecimal(b))
        else a.compareTo(b)
      if ((c <= 0) == keepMin) a else b
    }

  private def renderStatsJson(stats: Seq[(String, ColStat)]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    stats.map { case (c, st) =>
      s"${q(c)}:{\"kind\":${q(st.kind)},\"min\":${q(st.min)},\"max\":${q(st.max)}}"
    }.mkString("{", ",", "}")
  }

  /** Parse one stats/payload JSON (the [[load]] grammar).
    * Unrolled-loop string pattern ([^"\]* then (\\. [^"\]*)*): the
    * per-char alternation form ((?:[^"\\]|\\.)*) backtrack-stacks one
    * frame per character and overflows on multi-KB values (the base64
    * bloom bitsets); the unrolled form consumes runs iteratively. */
  private[sources] def parseStatsJson(s: String): Map[String, ColStat] = {
    val str = "([^\"\\\\]*(?:\\\\.[^\"\\\\]*)*)"
    val entry =
      ("\"" + str + "\":\\{\"kind\":\"(num|str|bloom)\"," +
        "\"min\":\"" + str + "\",\"max\":\"" + str + "\"\\}").r
    def unq(x: String) = x.replace("\\\"", "\"").replace("\\\\", "\\")
    entry.findAllMatchIn(s).map(m =>
      unq(m.group(1)) -> ColStat(m.group(2), unq(m.group(3)), unq(m.group(4)))).toMap
  }

  /** Merge the per-file footer payloads of one written directory —
    * plus partition-column bounds recovered from the files' hive
    * paths — into the directory stats file, WITHOUT re-reading data.
    * `relPaths` must name every parquet file in the dir (the write's
    * payload keys, after the caller's missing-file repair). */
  private[sources] def writeFromFooterPayloads(fs: FileSystem, dirPath: HPath,
      perFile: Map[String, String], schema: StructType,
      partCols: Seq[String]): Unit = {
    val parsed = perFile.values.map(parseStatsJson).toSeq
    val n = parsed.flatMap(_.get(RowCountKey)).map(_.min.toLong).sum
    // empty part files (0-row write tasks) carry no bounds and no rows:
    // they cannot widen any range, so only row-carrying files must
    // agree on a column for its dir bound to be sound
    val nonEmpty = parsed.filter(_.get(RowCountKey).exists(_.min.toLong > 0))
    val dataCols = schema.fieldNames.filterNot(partCols.contains)
    val colStats = dataCols.flatMap { c =>
      val sts = nonEmpty.flatMap(_.get(c))
      // every row-carrying file must bound the column, else unsound
      if (sts.size != nonEmpty.size || sts.isEmpty) None
      else {
        val kind = sts.head.kind
        Some(c -> ColStat(kind,
          reduceBound(sts.map(_.min), kind, keepMin = true),
          reduceBound(sts.map(_.max), kind, keepMin = false)))
      }
    }
    // partition columns: values ride in the hive path segments
    val partStats = partCols.flatMap { c =>
      val vals = perFile.keys.toSeq.flatMap { rel =>
        rel.split('/').dropRight(1).collectFirst {
          case seg if seg.startsWith(c + "=") =>
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(seg.drop(c.length + 1))
        }
      }.filter(_ != "__HIVE_DEFAULT_PARTITION__")
      if (vals.isEmpty) None
      else {
        val kind = schema.find(_.name == c).map(_.dataType) match {
          case Some(_: ByteType | _: ShortType | _: IntegerType |
                    _: LongType | _: FloatType | _: DoubleType |
                    _: DecimalType) => Some("num")
          case Some(_: StringType | _: DateType | _: TimestampType) => Some("str")
          case _ => None
        }
        kind.map(k => c -> ColStat(k,
          reduceBound(vals, k, keepMin = true),
          reduceBound(vals, k, keepMin = false)))
      }
    }
    put(fs, new HPath(dirPath, FileName), renderStatsJson(
      (RowCountKey -> ColStat("num", n.toString, n.toString)) +:
        (colStats.toSeq ++ partStats)))
  }

  /** Footer-based stats for a directory whose files were written by an
    * external writer (no in-flight payloads to merge — the SQL
    * row-level-operation path): same result as
    * [[writeFromFooterPayloads]], with the footers read here instead
    * of by the write tasks — driver-side for a handful of files, one
    * distributed map job past 64 (the object-store round-trip knee).
    * `schema` is the TABLE schema (partition columns included; their
    * bounds come from the hive path segments). Falls back to the
    * scanning [[write]] when the table carries bloom stats. */
  def writeFromFooters(spark: SparkSession, dirPath: HPath,
      schema: StructType, partCols: Seq[String]): Unit = {
    val bloomCols = spark.conf.getOption("spark.graft.table.bloomCols")
      .exists(_.split(",").exists(_.trim.nonEmpty))
    if (bloomCols) { write(spark, dirPath); return }
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = dirPath.getFileSystem(hconf)
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
    val files = list(dirPath, "")
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    val perFile: Map[String, String] =
      if (files.size > 64)
        org.apache.spark.sql.graftbridge.StatsWriteBridge.mapFiles(
          spark, hconf, files.map(r => r -> new HPath(dirPath, r).toString),
          new FooterStatFn(dataSchema))
      else files.flatMap(r =>
        footerFileJson(hconf, new HPath(dirPath, r), dataSchema).map(r -> _)).toMap
    // a footer that would not render leaves its file unrepresented —
    // row counts would then UNDERCOUNT (unsound), so fall back to the
    // scanning path for the whole dir
    if (perFile.size != files.size) write(spark, dirPath)
    else writeFromFooterPayloads(fs, dirPath, perFile, schema, partCols)
  }

  /** Compute min/max for every stat-eligible column of the just-written
    * directory and persist them alongside the data. One cheap columnar
    * aggregate over data that is hot in the page cache. Kept as the
    * fallback for bloom-carrying tables ([[BloomPrefix]] — blooms need
    * the data, not just footers) and for footers the renderers cannot
    * bound; the commit hot paths derive the same file from parquet
    * footers via [[writeFromFooterPayloads]] / [[writeFromFooters]]. */
  def write(spark: SparkSession, dirPath: HPath): Unit = {
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df =
      try spark.read.parquet(dirPath.toString)
      catch {
        // an empty partitioned write leaves no parquet files at all —
        // record the zero row count so the dir prunes under any filter
        case _: org.apache.spark.sql.AnalysisException =>
          put(fs, new HPath(dirPath, FileName),
            s"""{"$RowCountKey":{"kind":"num","min":"0","max":"0"}}""")
          return
      }
    val eligible = df.schema.fields.flatMap { f =>
      f.dataType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
             _: FloatType | _: DoubleType | _: DecimalType => Some(f.name -> "num")
        case _: StringType => Some(f.name -> "str")
        case _: DateType | _: TimestampType => Some(f.name -> "str")
        case _ => None
      }
    }
    val bloomCols = spark.conf.getOption("spark.graft.table.bloomCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .filter(c => df.schema.fieldNames.contains(c))
    val bloomBits = spark.conf.getOption("spark.graft.table.bloomBits")
      .map(_.toInt).getOrElse(1 << 17)
    val aggs = (count(lit(1)).cast("string").as("__count") +: eligible.flatMap {
      case (c, _) =>
        Seq(min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c"))
    }) ++ bloomCols.map(c => graft.functions.Bloom
      .bloom(xxhash64(col(c)), bloomBits, BloomHashes).as(s"bloom_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[String]("__count")
    val stats = ((RowCountKey -> ColStat("num", n, n)) +: eligible.flatMap {
      case (c, kind) =>
        val mn = row.getAs[String](s"min_$c")
        val mx = row.getAs[String](s"max_$c")
        if (mn == null || mx == null) None else Some(c -> ColStat(kind, mn, mx))
    }) ++ bloomCols.map { c =>
      (BloomPrefix + c) -> ColStat("bloom",
        java.util.Base64.getEncoder.encodeToString(
          row.getAs[Array[Byte]](s"bloom_$c")),
        df.schema(c).dataType.catalogString)
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json = stats.map { case (c, st) =>
      s"${q(c)}:{\"kind\":${q(st.kind)},\"min\":${q(st.min)},\"max\":${q(st.max)}}"
    }.mkString("{", ",", "}")
    put(fs, new HPath(dirPath, FileName), json)
  }

  def load(fs: FileSystem, dirPath: HPath): Option[Map[String, ColStat]] = {
    val p = new HPath(dirPath, FileName)
    if (!fs.exists(p)) None
    else {
      val s = {
        val in = fs.open(p)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      }
      Some(parseStatsJson(s))
    }
  }

  /** Resolve a user predicate Column against `schema` so the expression
    * tree carries real catalyst comparison nodes (the Spark 4 Column API
    * wraps ColumnNodes until analysis). Cheap: an empty local relation
    * analyzed once, no jobs. */
  def analyze(spark: SparkSession, schema: StructType, condition: Column): Expression = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    empty.filter(condition).queryExecution.analyzed.collectFirst {
      case f: logical.Filter => f.condition
    }.getOrElse(Literal(true))
  }

  /** Could any row in a directory with `stats` satisfy `cond`?
    * (`cond` is the analyzed predicate from [[analyze]].) */
  def mayMatch(cond: Expression, stats: Map[String, ColStat]): Boolean =
    if (stats.get(RowCountKey).exists(_.max.toDouble == 0)) false
    else mayMatch0(cond, stats)

  private def mayMatch0(cond: Expression, stats: Map[String, ColStat]): Boolean = cond match {
    case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
    case EqualTo(AttrName(a), Lit(v)) =>
      inRange(stats.get(a), v, v) && bloomMayContain(stats, a, v)
    case EqualTo(Lit(v), AttrName(a)) =>
      inRange(stats.get(a), v, v) && bloomMayContain(stats, a, v)
    case GreaterThan(AttrName(a), Lit(v)) => gt(stats.get(a), v, orEqual = false)
    case GreaterThanOrEqual(AttrName(a), Lit(v)) => gt(stats.get(a), v, orEqual = true)
    case LessThan(AttrName(a), Lit(v)) => lt(stats.get(a), v, orEqual = false)
    case LessThanOrEqual(AttrName(a), Lit(v)) => lt(stats.get(a), v, orEqual = true)
    case GreaterThan(Lit(v), AttrName(a)) => lt(stats.get(a), v, orEqual = false)
    case GreaterThanOrEqual(Lit(v), AttrName(a)) => lt(stats.get(a), v, orEqual = true)
    case LessThan(Lit(v), AttrName(a)) => gt(stats.get(a), v, orEqual = false)
    case LessThanOrEqual(Lit(v), AttrName(a)) => gt(stats.get(a), v, orEqual = true)
    case In(AttrName(a), vs) if vs.forall(Lit.unapply(_).isDefined) =>
      vs.flatMap(Lit.unapply).exists(v =>
        inRange(stats.get(a), v, v) && bloomMayContain(stats, a, v))
    // transform-aware pruning: `to_date(ts) <op> <date>` (analyzed as a
    // cast of a timestamp attribute to date) compares against the
    // DAY PREFIX of the timestamp's ISO stats — the stats-level analog
    // of Iceberg's days() partition-transform predicate rewrite, so
    // day-grained filters prune directories without a days() layout.
    case EqualTo(TsDayCast(a), DayLit(d)) => dayCmp(stats.get(a), d, "=")
    case EqualTo(DayLit(d), TsDayCast(a)) => dayCmp(stats.get(a), d, "=")
    case GreaterThan(TsDayCast(a), DayLit(d)) => dayCmp(stats.get(a), d, ">")
    case GreaterThanOrEqual(TsDayCast(a), DayLit(d)) => dayCmp(stats.get(a), d, ">=")
    case LessThan(TsDayCast(a), DayLit(d)) => dayCmp(stats.get(a), d, "<")
    case LessThanOrEqual(TsDayCast(a), DayLit(d)) => dayCmp(stats.get(a), d, "<=")
    case GreaterThan(DayLit(d), TsDayCast(a)) => dayCmp(stats.get(a), d, "<")
    case GreaterThanOrEqual(DayLit(d), TsDayCast(a)) => dayCmp(stats.get(a), d, "<=")
    case LessThan(DayLit(d), TsDayCast(a)) => dayCmp(stats.get(a), d, ">")
    case LessThanOrEqual(DayLit(d), TsDayCast(a)) => dayCmp(stats.get(a), d, ">=")
    case In(TsDayCast(a), vs) if vs.forall(DayLit.unapply(_).isDefined) =>
      vs.flatMap(DayLit.unapply).exists(d => dayCmp(stats.get(a), d, "="))
    case _ => true // unsupported shape — keep the directory
  }

  /** `CAST(<timestamp attribute> AS DATE)` — the analyzed form of
    * `to_date(ts)` / `DATE(ts)` predicates. */
  private object TsDayCast {
    def unapply(e: Expression): Option[String] = e match {
      case Cast(a: AttributeReference, DateType, _, _)
        if a.dataType.isInstanceOf[TimestampType] => Some(a.name)
      // analyzed-but-not-yet-optimized form: to_date(ts) stays a
      // RuntimeReplaceable (ParseToDate) whose replacement is the cast
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        unapply(r.replacement)
      case _ => None
    }
  }

  /** A date literal as its ISO day string: a folded DATE literal, or an
    * ISO-day string literal under an analyzer-inserted (not yet
    * constant-folded) cast to date. */
  private object DayLit {
    def unapply(e: Expression): Option[String] = e match {
      case Literal(v: Int, DateType) =>
        Some(java.time.LocalDate.ofEpochDay(v.toLong).toString)
      case Literal(s, StringType) if s != null &&
          s.toString.matches("\\d{4}-\\d{2}-\\d{2}") => Some(s.toString)
      case c: Cast if c.dataType == DateType => unapply(c.child)
      case _ => None
    }
  }

  /** Day-grained overlap test against a timestamp column's ISO string
    * stats: the first 10 chars of "yyyy-MM-dd HH:mm:ss…" are the day,
    * and day strings order lexicographically. */
  private def dayCmp(st: Option[ColStat], d: String, op: String): Boolean =
    st match {
      case Some(s) if s.kind == "str" &&
          s.min.length >= 10 && s.max.length >= 10 =>
        val (lo, hi) = (s.min.take(10), s.max.take(10))
        op match {
          case "="  => hi >= d && lo <= d
          case ">"  => hi > d
          case ">=" => hi >= d
          case "<"  => lo < d
          case "<=" => lo <= d
        }
      case _ => true
    }

  /** Point-lookup skip via the per-dir Bloom: false only when the
    * filter exists for the column, the literal's type equals the type
    * the filter was built over (Lit strips analyzer casts, so a
    * cross-type literal would hash differently), and all probe bits are
    * clear — provably absent. Anything else keeps the dir. */
  private def bloomMayContain(stats: Map[String, ColStat], a: String,
                              l: Literal): Boolean =
    stats.get(BloomPrefix + a) match {
      case Some(s) if s.kind == "bloom" && s.max == l.dataType.catalogString =>
        val h = org.apache.spark.sql.catalyst.expressions
          .XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
        graft.functions.Bloom.mightContain(
          java.util.Base64.getDecoder.decode(s.min), h, BloomHashes)
      case _ => true
    }

  private object AttrName {
    def unapply(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
  }

  private object Lit {
    def unapply(e: Expression): Option[Literal] = e match {
      case l: Literal if l.value != null => Some(l)
      case c: Cast => unapply(c.child) // analyzer-inserted literal casts
      case _ => None
    }
  }

  /** Compare stats bounds against a literal: "num" via BigDecimal
    * (NOT double — a double round-trip collapses longs above 2^53,
    * and a strict-inequality predicate on e.g. snowflake-style IDs
    * could then wrongly prune a directory that contains matching
    * rows; BigDecimal compares the stored decimal strings exactly at
    * any magnitude), "str" lexicographically. Date/timestamp stats are
    * stored as Spark's cast-to-string rendering (ISO, UTC session) —
    * literals are rendered the same way, and the trimmed-fraction ISO
    * format orders lexicographically. Combinations that can't compare
    * safely return None — the caller keeps the directory (NaN/Infinity
    * bounds land here via the NumberFormatException guard). */
  private def cmp(st: ColStat, l: Literal): Option[(Int, Int)] = {
    if (st.kind == "num") l.dataType match {
      case _: NumericType =>
        try {
          val d = new java.math.BigDecimal(l.value.toString)
          Some((new java.math.BigDecimal(st.min).compareTo(d),
                new java.math.BigDecimal(st.max).compareTo(d)))
        } catch { case _: NumberFormatException => None }
      case _ => None
    } else {
      val rendered: Option[String] = l.dataType match {
        case _: StringType => Some(l.value.toString)
        case _: DateType =>
          Some(java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong).toString)
        case _: TimestampType => Some(renderTimestampMicros(l.value.asInstanceOf[Long]))
        case _ => None
      }
      rendered.map(s => (st.min.compareTo(s), st.max.compareTo(s)))
    }
  }

  /** Micros-since-epoch → Spark's cast-to-string form
    * ("yyyy-MM-dd HH:mm:ss[.fraction-with-trailing-zeros-trimmed]",
    * UTC — graft sessions pin spark.sql.session.timeZone=UTC). */
  private def renderTimestampMicros(us: Long): String = {
    val secs = Math.floorDiv(us, 1000000L)
    val micros = Math.floorMod(us, 1000000L)
    val base = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    if (micros == 0) base
    else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
  }

  private def inRange(st: Option[ColStat], lo: Literal, hi: Literal): Boolean =
    st match {
      case Some(s) => cmp(s, lo).forall { case (_, maxCmp) => maxCmp >= 0 } &&
        cmp(s, hi).forall { case (minCmp, _) => minCmp <= 0 }
      case None => true
    }

  /** may the dir contain x with x > v (or >=)? true iff max > v (>=) */
  private def gt(st: Option[ColStat], v: Literal, orEqual: Boolean): Boolean =
    st match {
      case Some(s) => cmp(s, v).forall { case (_, maxCmp) =>
        if (orEqual) maxCmp >= 0 else maxCmp > 0 }
      case None => true
    }

  /** may the dir contain x with x < v (or <=)? true iff min < v (<=) */
  private def lt(st: Option[ColStat], v: Literal, orEqual: Boolean): Boolean =
    st match {
      case Some(s) => cmp(s, v).forall { case (minCmp, _) =>
        if (orEqual) minCmp <= 0 else minCmp < 0 }
      case None => true
    }
}
