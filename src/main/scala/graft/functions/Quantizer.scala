package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded spherical k-means coarse quantizer for IVF-style vector
  * indexes (reference behavior: ANN cell probing over embedding
  * columns; algorithm per the standard k-means++ / Lloyd literature).
  *
  * Training runs driver-side over a BOUNDED deterministic sample
  * (constant size, independent of corpus scale — the same shape as
  * collecting table statistics): the output is k unit centroids baked
  * into the plan as literals, so cell assignment is a pure scan-side
  * projection — no shuffle, no driver round-trip, no crossJoin — and
  * the scan stays inside whole-stage codegen.
  */
object Quantizer {

  /** Train k unit centroids on a deterministic sample of `emb`.
    *
    * @param df      relation holding the vectors
    * @param idCol   unique id column (sampling orders by xxhash64(id) —
    *                deterministic, scan-shaped TakeOrdered, no full sort)
    * @param embCol  array<double> vector column
    */
  def train(df: DataFrame, idCol: String, embCol: String, k: Int,
            sampleSize: Int = 2048, iters: Int = 20, seed: Long = 42L): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol).as("id"), col(embCol).as("v"))
      .orderBy(xxhash64(col("id")))
      .limit(sampleSize)
      .collect()
      .map(r => normalize(r.getAs[scala.collection.Seq[Double]]("v").toArray))
    require(sample.nonEmpty, "quantizer training sample is empty")
    val rng = new scala.util.Random(seed)

    // k-means++ init on angular distance (1 - cos).
    val cents = scala.collection.mutable.ArrayBuffer(sample(rng.nextInt(sample.length)))
    while (cents.size < k) {
      val w = sample.map(x => math.max(0.0, 1.0 - cents.map(c => dot(x, c)).max))
      val total = w.sum
      val pick =
        if (total <= 0) rng.nextInt(sample.length)
        else {
          val r = rng.nextDouble() * total
          var acc = 0.0; var i = 0
          while (i < sample.length - 1 && acc + w(i) < r) { acc += w(i); i += 1 }
          i
        }
      cents += sample(pick)
    }

    // Lloyd iterations: assign to max-dot centroid, recenter on the
    // normalized mean (spherical k-means). Empty cells keep their seed.
    var c = cents.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](c(0).length))
      val counts = new Array[Int](k)
      sample.foreach { x =>
        val j = assign(x, c)
        var i = 0
        while (i < x.length) { sums(j)(i) += x(i); i += 1 }
        counts(j) += 1
      }
      c = Array.tabulate(k)(j => if (counts(j) > 0) normalize(sums(j)) else c(j))
    }
    c
  }

  /** Index of the centroid with the highest dot product. */
  def assign(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < cents.length) {
      val d = dot(x, cents(j))
      if (d > bestDot) { bestDot = d; best = j }
      j += 1
    }
    best
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0) v else v.map(_ / n)
  }

  /** Scan-side cell assignment: the `m` nearest cells (by cosine,
    * deterministic cell-id tie-break) as array<int>, all inside codegen.
    * Ranking by raw dot against unit centroids equals ranking by cosine
    * (the vector's own norm is a positive constant factor). */
  def topCells(emb: Column, cents: Array[Array[Double]], m: Int): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct((-DotProduct.dot_product(emb, typedLit(c.toSeq))).as("negsim"),
        lit(i).as("cell"))
    }: _*)
    transform(slice(array_sort(scored), 1, m), s => s.getField("cell"))
  }

  /** Cosine of `emb` to each centroid as array<double> (index = cell
    * id). A zero-norm vector has no direction: its cosines are 0
    * (conservative — the caller's acos turns that into a π/2 radius)
    * rather than a division by zero, which ANSI mode (Spark 4 default)
    * raises as a hard error even for doubles. */
  def cellCosines(emb: Column, nrm: Column, cents: Array[Array[Double]]): Column =
    array(cents.map(c =>
      when(nrm =!= 0.0, DotProduct.dot_product(emb, typedLit(c.toSeq)) / nrm)
        .otherwise(0.0)): _*)
}
