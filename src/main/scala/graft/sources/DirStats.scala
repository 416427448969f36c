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

  /** Compute min/max for every stat-eligible column of the just-written
    * directory and persist them alongside the data. One cheap columnar
    * aggregate over data that is hot in the page cache. */
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
      // unrolled-loop string pattern ([^"\]* then (\\. [^"\]*)*): the
      // per-char alternation form ((?:[^"\\]|\\.)*) backtrack-stacks one
      // frame per character and overflows on multi-KB values (the base64
      // bloom bitsets); the unrolled form consumes runs iteratively
      val str = "([^\"\\\\]*(?:\\\\.[^\"\\\\]*)*)"
      val entry =
        ("\"" + str + "\":\\{\"kind\":\"(num|str|bloom)\"," +
          "\"min\":\"" + str + "\",\"max\":\"" + str + "\"\\}").r
      def unq(x: String) = x.replace("\\\"", "\"").replace("\\\\", "\\")
      Some(entry.findAllMatchIn(s).map(m =>
        unq(m.group(1)) -> ColStat(m.group(2), unq(m.group(3)), unq(m.group(4)))).toMap)
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
