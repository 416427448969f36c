package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArrayEqFraction, Fingerprint64, MinHashAgg}

/** Property-based invariants of the numeric/hashing building blocks —
  * the properties the cross-engine exactness and LSH guarantees rest
  * on. (Raw ScalaCheck generators with fixed seeds; the
  * scalatest-scalacheck bridge artifact isn't available offline.) */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("decimal-cents summation is permutation-invariant (doubles are not)") {
    val gen = Gen.listOfN(200, Gen.chooseNum(1L, 10_000_000L))
    samples(gen, 50).foreach { cents =>
      val a = cents.map(BigDecimal(_) / 100)
      assert(a.sorted.sum == a.sorted.reverse.sum)
      // contrast: the same data as doubles IS order-sensitive for some
      // samples; decimal exactness is what the engine relies on
    }
  }

  test("fingerprint64 is deterministic and sensitive to any change") {
    val pairs = samples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr), 200)
    pairs.foreach { case (a, b) =>
      val fa = Fingerprint64.hash(a.getBytes("UTF-8"))
      assert(fa == Fingerprint64.hash(a.getBytes("UTF-8")))
      if (a != b)
        assert(fa != Fingerprint64.hash(b.getBytes("UTF-8")))
    }
  }

  test("minhash coefficients are valid Carter-Wegman parameters") {
    val cs = MinHashAgg.coefficients(128, seed = 42)
    assert(cs.length == 128)
    cs.foreach { case (a, b) =>
      assert(a >= 1 && a < MinHashAgg.P)
      assert(b >= 0 && b < MinHashAgg.P)
      // a*h + b for h < P must stay below 2^63 (ANSI overflow safety)
      assert(a <= (Long.MaxValue - b) / (MinHashAgg.P - 1))
    }
    assert(cs.toSeq == MinHashAgg.coefficients(128, seed = 42).toSeq,
      "executor-side regeneration must agree")
  }

  test("array_eq_fraction is a similarity: reflexive, symmetric, bounded") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val gen = Gen.zip(Gen.listOfN(32, Gen.chooseNum(0L, 8L)),
                      Gen.listOfN(32, Gen.chooseNum(0L, 8L)))
    def f(a: List[Long], b: List[Long]) =
      ArrayEqFraction.eqFraction(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
    samples(gen, 100).foreach { case (x, y) =>
      assert(f(x, x) == 1.0)
      assert(f(x, y) == f(y, x))
      val v = f(x, y)
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("minhash eq-fraction estimates true jaccard within tolerance") {
    // two token sets with known overlap → signature agreement ≈ jaccard
    val coeffs = MinHashAgg.coefficients(128, seed = 42)
    def sig(tokens: Seq[Long]): Array[Long] = {
      val buf = Array.fill(128)(Long.MaxValue)
      tokens.foreach { h =>
        var k = 0
        while (k < 128) {
          val (a, b) = coeffs(k)
          val p = (a * (math.floorMod(h, MinHashAgg.P)) + b) % MinHashAgg.P
          if (p < buf(k)) buf(k) = p
          k += 1
        }
      }
      buf
    }
    val shared = (1L to 80L).map(_ * 2654435761L)
    val onlyA = (1L to 20L).map(_ * 40503L + 7L)
    val onlyB = (1L to 20L).map(_ * 69069L + 13L)
    val sa = sig(shared ++ onlyA)
    val sb = sig(shared ++ onlyB)
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val trueJ = 80.0 / 120.0
    assert(math.abs(est - trueJ) < 0.15, s"estimate $est vs true $trueJ")
  }

  test("topk aggregate equals sort-take-k under any partitioning and merge order") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      k <- Gen.chooseNum(1, 10)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0, 20).map(_ / 20.0)))
      nParts <- Gen.chooseNum(1, 5)
    } yield (k, rows, nParts)
    samples(gen, 150).foreach { case (k, rows, nParts) =>
      val agg = graft.functions.TopKAgg(
        BoundReference(0, LongType, nullable = false),
        BoundReference(1, DoubleType, nullable = false), k)
      val parts = rows.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toSeq
      val partials = parts.map { p =>
        var b = agg.createAggregationBuffer()
        p.foreach { case (id, sc) => b = agg.update(b, InternalRow(id, sc)) }
        agg.deserialize(agg.serialize(b)) // exercise the shuffle roundtrip
      }
      var merged = agg.createAggregationBuffer()
      partials.foreach(p => merged = agg.merge(merged, p))
      // reference: global sort (score desc, id asc) over DISTINCT pairs
      // (the heap rejects exact duplicates by contract), take k
      val want = rows.distinct.sortBy { case (id, sc) => (-sc, id) }.take(k)
      assert(merged.toList == want, s"k=$k nParts=$nParts rows=$rows")
    }
  }

  test("topTokenCount equals the naive max-frequency count on random arrays") {
    import TestSpark._
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e", "ff", "g"))
    val cases = samples(gen, 300).map { toks =>
      val want =
        if (toks.isEmpty) 0
        else toks.groupBy(identity).values.map(_.size).max
      (toks, want)
    }
    val got = cases.toDF("toks", "want")
      .select(graft.operators.TextAnalysis.topTokenCount(col("toks")).as("got"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("commit JSON round-trips specs/dirs/renames — including comma specs") {
    import graft.sources.GraftTable.Commit
    val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))
    val spec = Gen.oneOf(
      ident,
      ident.map(c => s"days($c)"),
      ident.map(c => s"hours($c)"),
      Gen.zip(Gen.chooseNum(1, 64), ident).map { case (n, c) => s"bucket($n, $c)" },
      Gen.zip(Gen.chooseNum(1, 32), ident).map { case (w, c) => s"truncate($w, $c)" })
    val gen = for {
      v <- Gen.chooseNum(0, 9999)
      action <- Gen.oneOf("create", "append", "overwrite", "replaceWhere")
      dirs <- Gen.listOfN(3, ident.map(d => s"d0001-$d"))
      specs <- Gen.listOf(spec).map(_.take(4))
      ts <- Gen.chooseNum(0L, Long.MaxValue / 2)
      renames <- Gen.listOf(Gen.zip(ident, ident)).map(_.take(3))
    } yield Commit(v, action, "", dirs, specs, ts, renames)
    samples(gen, 200).foreach { c =>
      val back = Commit.fromJson(c.toJson)
      assert(back == c, s"round-trip mangled:\n $c\n $back")
    }
  }
}
