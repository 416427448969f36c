package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayEqFraction, DeflateLen, DotProduct, Fingerprint64, IcebergBucket, PHash64}
import graft.plans.AsOfStrategy

/** Session-extension entry point: wires the custom planner strategy and
  * exposes the native expressions as SQL functions, so the library's
  * surface is reachable from pure SQL (the reference's users drive
  * everything through spark.sql).
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    // SQL views over DSv2 view catalogs (stock Spark ships only the
    // SPI); the hint batch runs before ResolveSessionCatalog's refusal
    e.injectHintResolutionRule(graft.plans.ResolveGraftViews)
    // UPDATE/DELETE/MERGE on raw foreign roots (cat.delta.`/p`):
    // post-hoc, after Spark's own row-level rewrites have passed over
    // the non-SupportsRowLevelOperations target untouched
    e.injectPostHocResolutionRule(graft.plans.ResolveForeignDml)
    e.injectFunction((
      new FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (args: Seq[Expression]) => Fingerprint64(args.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("array_eq_fraction"),
      new ExpressionInfo(classOf[ArrayEqFraction].getName, "array_eq_fraction"),
      (args: Seq[Expression]) => ArrayEqFraction(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("phash64"),
      new ExpressionInfo(classOf[PHash64].getName, "phash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"phash64 takes 1 argument, got ${args.size}")
        PHash64(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName,
        "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.size == 1,
          s"nfc_normalize takes 1 argument, got ${args.size}")
        graft.functions.NfcNormalize(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"deflate_len takes 1 argument, got ${args.size}")
        DeflateLen(args.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("iceberg_bucket"),
      new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          s"iceberg_bucket takes (numBuckets, col), got ${args.size} arguments")
        val n = args.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"iceberg_bucket numBuckets must be an integer literal, got $other")
        }
        IcebergBucket(n, args(1))
      }))
  }
}
