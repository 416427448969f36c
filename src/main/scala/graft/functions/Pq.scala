package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-bounded ANN code
  * path: a D-dim vector becomes M sub-codes (one byte each at K ≤ 256),
  * so a 64-dim float corpus shrinks 32× and candidate scoring reads
  * codes, never vectors.
  *
  * Training mirrors [[Quantizer]]: driver-side over a BOUNDED
  * deterministic sample (table-stats-shaped), output baked into the
  * plan as literals. Encoding and asymmetric-distance (ADC) scoring are
  * pure scan-side projections built from codegen'd [[DotProduct]] +
  * literal-array lookups — no shuffle, no UDF.
  *
  * Because the M subspaces partition the coordinates, the
  * reconstruction decomposes exactly: dot(q, x̂) = Σₘ dot(qₘ, x̂ₘ) and
  * |x̂|² = Σₘ |x̂ₘ|² — ADC cosine needs only per-subspace dot lookups
  * and code-norm lookups, both O(M) per candidate.
  */
object Pq {

  /** Codebooks + precomputed squared norms, both plan-literal-sized:
    * M·K·(D/M) doubles ≈ the footprint of K full vectors. */
  final case class Model(codebooks: Array[Array[Array[Double]]],
                         normSq: Array[Array[Double]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks(0)(0).length
  }

  /** Train K L2 centroids per subspace on a deterministic sample
    * (same xxhash64-ordered sampling contract as [[Quantizer.train]]). */
  def train(df: DataFrame, idCol: String, embCol: String,
            m: Int, k: Int, sampleSize: Int = 2048, iters: Int = 20,
            seed: Long = 42L): Model = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol).as("id"), col(embCol).as("v"))
      .orderBy(xxhash64(col("id")))
      .limit(sampleSize)
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    require(sample.nonEmpty, "pq training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val codebooks = Array.tabulate(m) { ms =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, ms * sub, (ms + 1) * sub))
      kmeans(pts, k, iters, seed + ms)
    }
    Model(codebooks, codebooks.map(_.map(c => c.map(x => x * x).sum)))
  }

  /** Plain seeded L2 k-means++ / Lloyd on one subspace's points. */
  private def kmeans(pts: Array[Array[Double]], k: Int, iters: Int,
                     seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val cents = scala.collection.mutable.ArrayBuffer(pts(rng.nextInt(pts.length)))
    while (cents.size < k) {
      val w = pts.map(p => cents.map(c => d2(p, c)).min)
      val total = w.sum
      val pick =
        if (total <= 0) rng.nextInt(pts.length)
        else {
          val r = rng.nextDouble() * total
          var acc = 0.0; var i = 0
          while (i < pts.length - 1 && acc + w(i) < r) { acc += w(i); i += 1 }
          i
        }
      cents += pts(pick)
    }
    var c = cents.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](pts.head.length))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var j = 0
        while (j < c.length) { val d = d2(p, c(j)); if (d < bd) { bd = d; best = j }; j += 1 }
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      c = Array.tabulate(k)(j =>
        if (counts(j) > 0) sums(j).map(_ / counts(j)) else c(j))
    }
    c
  }

  /** Scan-side PQ encoding: array<int> of M sub-codes. Per subspace the
    * L2-nearest code maximizes dot(xₘ, cbⱼ) − |cbⱼ|²/2 (|xₘ|² is
    * constant across j), so each sub-code is an argmax over K codegen'd
    * dot products against literal codebook rows — the array_sort(struct)
    * argmin idiom with a deterministic code-id tie-break. */
  def encode(emb: Column, model: Model): Column = {
    val sub = model.subDim
    array((0 until model.m).map { ms =>
      val xm = slice(emb, ms * sub + 1, sub)
      val scored = array(model.codebooks(ms).zipWithIndex.map { case (c, j) =>
        struct((lit(model.normSq(ms)(j) / 2.0) -
          DotProduct.dot_product(xm, typedLit(c.toSeq))).as("negscore"),
          lit(j).as("code"))
      }: _*)
      element_at(array_sort(scored), 1).getField("code")
    }: _*)
  }

  /** ADC cosine of a full query vector against a candidate's codes:
    * Σₘ dot(qₘ, cb[m][codeₘ]) / (|q| · sqrt(Σₘ |cb[m][codeₘ]|²)).
    * Codebook and norm tables ride the plan as nested-array literals;
    * per-candidate cost is M dot products of D/M dims — identical
    * arithmetic to scoring one full vector, but against 8 code bytes of
    * storage instead of 256 float bytes. */
  def adcCosine(qEmb: Column, qNrm: Column, codes: Column, model: Model): Column = {
    val sub = model.subDim
    val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val nsLit = typedLit(model.normSq.map(_.toSeq).toSeq)
    val dotSum = (0 until model.m).map { ms =>
      DotProduct.dot_product(
        slice(qEmb, ms * sub + 1, sub),
        element_at(element_at(cbLit, ms + 1), element_at(codes, ms + 1) + 1))
    }.reduce(_ + _)
    val recNormSq = (0 until model.m).map { ms =>
      element_at(element_at(nsLit, ms + 1), element_at(codes, ms + 1) + 1)
    }.reduce(_ + _)
    dotSum / (qNrm * sqrt(recNormSq))
  }
}
