package graft.functions

import scala.collection.mutable

/** Minimal in-memory HNSW (Hierarchical Navigable Small World) graph
  * index over cosine similarity — the per-partition index behind the
  * s4 ANN operator.
  *
  * This is the standard published algorithm (Malkov & Yashunin 2016,
  * arXiv:1603.09320): every element gets a geometric random level;
  * insertion greedily descends from the entry point through the upper
  * layers, then beam-searches (efConstruction) each layer ≤ its level
  * and links to the M closest candidates found. Queries descend the
  * same way and beam-search layer 0 with efSearch.
  *
  * Scale shape: one index per PARTITION of the corpus (built inside
  * mapPartitions — construction is embarrassingly parallel and the
  * graph never leaves its executor); queries broadcast to every shard,
  * each shard answers top-k from its index, and a global top-k merge
  * reduces shard answers. Deterministic: the level RNG is seeded per
  * shard, and all similarity ties break by id.
  */
final class Hnsw(dim: Int, m: Int = 8, efConstruction: Int = 64,
                 seed: Long = 42L) {

  private val mL = 1.0 / math.log(m.toDouble)
  private val rnd = new scala.util.Random(seed)

  private val ids = mutable.ArrayBuffer[Long]()
  private val vecs = mutable.ArrayBuffer[Array[Double]]()
  private val norms = mutable.ArrayBuffer[Double]()
  // neighbors(node)(layer) = linked node indices
  private val neighbors = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
  private var entry: Int = -1
  private var maxLevel: Int = -1

  private def cos(a: Int, q: Array[Double], qNorm: Double): Double = {
    val v = vecs(a)
    var s = 0.0; var i = 0
    while (i < dim) { s += v(i) * q(i); i += 1 }
    val d = norms(a) * qNorm
    if (d == 0.0) 0.0 else s / d
  }

  /** Greedy descent in one layer: hill-climb to the locally closest
    * node (the upper-layer navigation step). */
  private def greedy(start: Int, q: Array[Double], qNorm: Double, layer: Int): Int = {
    var cur = start
    var curSim = cos(cur, q, qNorm)
    var improved = true
    while (improved) {
      improved = false
      val ns = neighbors(cur)(layer)
      var i = 0
      while (i < ns.length) {
        val sim = cos(ns(i), q, qNorm)
        if (sim > curSim || (sim == curSim && ns(i) < cur)) {
          cur = ns(i); curSim = sim; improved = true
        }
        i += 1
      }
    }
    cur
  }

  /** Beam search one layer from `start`, keeping the best `ef`
    * candidates. Returns (index, sim) sorted best-first, id-tiebroken. */
  private def searchLayer(start: Int, q: Array[Double], qNorm: Double,
                          layer: Int, ef: Int): mutable.ArrayBuffer[(Int, Double)] = {
    implicit val best: Ordering[(Int, Double)] =
      Ordering.by[(Int, Double), (Double, Long)](t => (-t._2, ids(t._1)))
    val visited = mutable.HashSet(start)
    val candidates = mutable.PriorityQueue((start, cos(start, q, qNorm)))(best.reverse)
    val found = mutable.ArrayBuffer((start, cos(start, q, qNorm)))
    while (candidates.nonEmpty) {
      val (c, cSim) = candidates.dequeue()
      val worst = if (found.size < ef) Double.NegativeInfinity
                  else found.map(_._2).min
      if (cSim < worst && found.size >= ef) { candidates.clear() }
      else {
        val ns = neighbors(c)(layer)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (!visited.contains(n)) {
            visited += n
            val sim = cos(n, q, qNorm)
            if (found.size < ef || sim > found.map(_._2).min) {
              candidates.enqueue((n, sim))
              found += ((n, sim))
              if (found.size > ef) {
                val drop = found.zipWithIndex.minBy { case ((ix, s), _) => (s, -ids(ix)) }._2
                found.remove(drop)
              }
            }
          }
          i += 1
        }
      }
    }
    found.sortBy(t => (-t._2, ids(t._1)))
  }

  def insert(id: Long, vec: Array[Double]): Unit = {
    require(vec.length == dim)
    val idx = ids.length
    ids += id; vecs += vec
    var nrm = 0.0; var i = 0
    while (i < dim) { nrm += vec(i) * vec(i); i += 1 }
    norms += math.sqrt(nrm)
    val level = math.min(16, (-math.log(rnd.nextDouble().max(1e-12)) * mL).toInt)
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer[Int]())
    if (entry < 0) { entry = idx; maxLevel = level; return }
    val qNorm = norms(idx)
    var cur = entry
    var l = maxLevel
    while (l > level) { cur = greedy(cur, vec, qNorm, l); l -= 1 }
    while (l >= 0) {
      val found = searchLayer(cur, vec, qNorm, l, efConstruction)
      val links = found.take(m)
      links.foreach { case (n, _) =>
        neighbors(idx)(l) += n
        neighbors(n)(l) += idx
        // cap reverse degree at 2m: drop the farthest link
        val cap = 2 * m
        if (neighbors(n)(l).length > cap) {
          val nv = vecs(n); val nn = norms(n)
          val drop = neighbors(n)(l).zipWithIndex
            .minBy { case (x, _) => (cos(x, nv, nn), -ids(x)) }._2
          neighbors(n)(l).remove(drop)
        }
      }
      cur = found.head._1
      l -= 1
    }
    if (level > maxLevel) { maxLevel = level; entry = idx }
  }

  /** Top-k (id, cosine) for `q`, best-first, excluding `excludeId`. */
  def search(q: Array[Double], k: Int, ef: Int, excludeId: Long = Long.MinValue)
      : Seq[(Long, Double)] = {
    if (entry < 0) return Nil
    var nrm = 0.0; var i = 0
    while (i < dim) { nrm += q(i) * q(i); i += 1 }
    val qNorm = math.sqrt(nrm)
    var cur = entry
    var l = maxLevel
    while (l > 0) { cur = greedy(cur, q, qNorm, l); l -= 1 }
    searchLayer(cur, q, qNorm, 0, math.max(ef, k))
      .iterator.map { case (ix, sim) => (ids(ix), sim) }
      .filter(_._1 != excludeId)
      .take(k).toSeq
  }

  def size: Int = ids.length
}
