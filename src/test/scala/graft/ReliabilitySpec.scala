package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 reliability guards: the dedup relation cache must tolerate
  * reentrant builds (the r4 bug: nested computeIfAbsent on one
  * ConcurrentHashMap throws the JDK's "recursive update"
  * IllegalStateException whenever two keys land in the same bin —
  * per-JVM random, so it silently zeroed d3/d7/p2/p6 on unlucky JVMs);
  * query paths must not mutate session-global conf; Bench must report
  * failures instead of recording them as ~0s timings. */
class ReliabilitySpec extends AnyFunSuite {
  import TestSpark._

  test("cachedRel survives reentrant builds across many fresh keys") {
    // 300 fresh key pairs with a nested (dependency-style) build: under
    // the old computeIfAbsent implementation at least one outer/inner
    // pair lands in a shared bin with probability > 0.99 and throws
    // IllegalStateException; the get/build/putIfAbsent shape can never.
    (1 to 300).foreach { i =>
      val df = graft.operators.Dedup.cachedRel(spark, s"/reliability/$i", "outer") {
        val inner = graft.operators.Dedup.cachedRel(spark, s"/reliability/$i", "inner") {
          spark.range(1).toDF()
        }
        inner.select(col("id"))
      }
      assert(df.columns.sameElements(Array("id")))
    }
    // the full real dependency chain (pairs08 → minhashSigs → shingles)
    // still produces rows through the restructured cache
    assert(SparkEntry.queries("d3_minhash_lsh")(spark, sf).count() > 0)
  }

  test("d7 leaves session shuffle-partition conf untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    assert(SparkEntry.queries("d7_dedup_clusters")(spark, sf).count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("streaming drain leaves the parent session conf untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.graft.streaming.statePartitions", "2")
    try {
      // row-count parity with the batch twin, not a bare count>0 — a
      // weak >0 assertion stayed green while h1 returned 10 rows
      // instead of 3385 under the r6 ts-unit drift
      assert(SparkEntry.queries("h1_stream_window")(spark, sf).count() ==
        SparkEntry.queries("e1_tumbling_window")(spark, sf).count())
      assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    } finally spark.conf.unset("spark.graft.streaming.statePartitions")
  }

  test("bench measure records a failed query as an error, never a timing") {
    val rs = Bench.measure(Seq(
      "ok" -> (() => ()),
      "boom" -> (() => throw new RuntimeException("kaboom\nsecond line"))))
    assert(rs.find(_.name == "ok").get.err.isEmpty)
    val boom = rs.find(_.name == "boom").get.err
    assert(boom.exists(e => e.contains("RuntimeException") && e.contains("kaboom")))
    assert(boom.forall(!_.contains("second")))
  }

  test("bench canary flips the contamination label on mid-run stress") {
    // synthetic-stress shape of the r14 driver artifact: the host is
    // quiet when the suite starts, a co-tenant lands mid-run. The
    // canary samples interleave between queries, so the inflated
    // sample flips the verdict even though the start looked quiet.
    var tick = 0
    val fakeCanary = () => {
      tick += 1
      if (tick >= 2) 2.0 else 0.05 // quiet base, then stressed
    }
    val qs = (1 to 15).map(i => s"q$i" -> (() => ())).toSeq
    // default isContended never trips → no re-measure: 2 samples per
    // window (opening + closing), 15 queries in 2 windows of 10
    val (rs, samples) = Bench.measureWithCanary(qs, fakeCanary, every = 10)
    assert(rs.size == 15 && samples.size == 4, samples.toString)
    assert(Bench.canaryContended(base = 0.05, samples), samples.toString)
    // an all-quiet run does NOT trip: GC-jitter-sized wobble stays
    // inside the 4×+0.25s band
    assert(!Bench.canaryContended(0.05, Seq(0.05, 0.12, 0.25)))
    // the real canary runs and returns a plausible quiet timing
    val real = Bench.runCanary(spark, 4)
    assert(real > 0.0 && real < 30.0, real.toString)
    // the host-busy probe (the IO-visible co-tenant signal) returns a
    // fraction in [0,1] on Linux, NaN elsewhere — and NaN never trips
    // the contended comparison
    val busy = Bench.hostBusyFraction(50)
    assert(busy.isNaN || (busy >= 0.0 && busy <= 1.0), busy.toString)
    assert(!(Double.NaN > 0.5))
  }

  test("bench self-heals a contaminated window: re-measures once quiet, " +
      "flags only windows that stay dirty") {
    val band = (s: Double) => s > 0.05 * 4 + 0.25
    def mkQs(runs: scala.collection.mutable.Map[String, Int]) =
      (1 to 15).map { i =>
        val n = s"q$i"
        n -> (() => { runs(n) = runs.getOrElse(n, 0) + 1 })
      }.toSeq
    // a co-tenant lands during window 1 (its CLOSING sample trips) and
    // leaves before the recovery poll: the window re-measures and the
    // artifact carries CLEAN timings — no contended flags anywhere
    locally {
      var tick = 0
      val canary = () => { tick += 1; if (tick == 2) 2.0 else 0.05 }
      val runs = scala.collection.mutable.Map[String, Int]()
      val (rs, samples) = Bench.measureWithCanary(mkQs(runs), canary,
        every = 10, isContended = band, awaitQuiet = () => true)
      assert(rs.forall(!_.contended), rs.filter(_.contended).toString)
      // window 1 ran twice (10 queries re-measured), window 2 once
      assert((1 to 10).forall(i => runs(s"q$i") == 2), runs.toString)
      assert((11 to 15).forall(i => runs(s"q$i") == 1), runs.toString)
      // w1: open + dirty close + re-measure close; w2: open + close
      assert(samples.size == 5, samples.toString)
    }
    // recovery never comes (awaitQuiet times out): the window is NOT
    // re-measured and its queries carry per-query contended flags —
    // the clean window 2 stays unflagged
    locally {
      var tick = 0
      val canary = () => { tick += 1; if (tick == 2) 2.0 else 0.05 }
      val runs = scala.collection.mutable.Map[String, Int]()
      val (rs, _) = Bench.measureWithCanary(mkQs(runs), canary,
        every = 10, isContended = band, awaitQuiet = () => false)
      assert((1 to 15).forall(i => runs(s"q$i") == 1), runs.toString)
      assert(rs.take(10).forall(_.contended), rs.toString)
      assert(rs.drop(10).forall(!_.contended), rs.toString)
    }
    // the re-measure budget bounds wall time: with budget 0 every
    // dirty window flags instead of re-running
    locally {
      val canary = () => 2.0 // contended throughout
      val runs = scala.collection.mutable.Map[String, Int]()
      val (rs, _) = Bench.measureWithCanary(mkQs(runs), canary,
        every = 10, isContended = band, awaitQuiet = () => true,
        maxRemeasuredWindows = 0)
      assert((1 to 15).forall(i => runs(s"q$i") == 1), runs.toString)
      assert(rs.forall(_.contended), rs.toString)
    }
    // a re-measured window whose SECOND close is still dirty flags too
    locally {
      val canary = () => 2.0
      val runs = scala.collection.mutable.Map[String, Int]()
      val (rs, _) = Bench.measureWithCanary(mkQs(runs), canary,
        every = 10, isContended = band, awaitQuiet = () => true,
        maxRemeasuredWindows = 3)
      assert((1 to 15).forall(i => runs(s"q$i") == 2), runs.toString)
      assert(rs.forall(_.contended), rs.toString)
    }
  }

  test("relCache evicts LRU by entry cap and unpersists what it drops") {
    // Eviction that only clears map entries strands the persisted
    // blocks in executor storage (the cache held the sole reference) —
    // a slow leak in a long-lived session cycling >64 dirs.
    // Drain residue from earlier suites first so the fill below
    // crosses the entry cap exactly when expected.
    import scala.jdk.CollectionConverters._
    graft.operators.Dedup.relCache.synchronized {
      graft.operators.Dedup.relCache.values.asScala.foreach(_.unpersist(false))
      graft.operators.Dedup.relCache.clear()
    }
    val dfs = (1 to 64).map { i =>
      graft.operators.Dedup.cachedRel(spark, s"/evict/$i", "k") {
        spark.range(i).toDF()
      }
    }
    assert(dfs.forall(_.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE), "cache must persist entries")
    // the 65th insert crosses the entry cap: the LEAST-recently-used
    // entry (and only it) is evicted AND unpersisted (trigger plan
    // distinct from every dfs plan — storageLevel resolves by logical
    // plan, so a same-plan trigger would shadow the unpersist under
    // its own fresh cache entry)
    graft.operators.Dedup.cachedRel(spark, "/evict/trigger", "k") {
      spark.range(9999).toDF()
    }
    assert(dfs.head.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "evicted LRU relation must be unpersisted, not stranded in storage")
    assert(dfs.tail.forall(_.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE),
      "entries within budget must stay persisted")
  }

  test("relCache evicts LRU by byte budget once relations materialize") {
    import scala.jdk.CollectionConverters._
    graft.operators.Dedup.relCache.synchronized {
      graft.operators.Dedup.relCache.values.asScala.foreach(_.unpersist(false))
      graft.operators.Dedup.relCache.clear()
    }
    spark.conf.set("spark.graft.cache.maxBytes", "1")
    try {
      val a = graft.operators.Dedup.cachedRel(spark, "/bytes/a", "k") {
        spark.range(100000).toDF()
      }
      a.count() // materialize: a now reports real bytes > budget
      val b = graft.operators.Dedup.cachedRel(spark, "/bytes/b", "k") {
        spark.range(200000).toDF()
      }
      // inserting b must evict a (over the 1-byte budget); b itself is
      // the just-touched entry and survives
      assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "over-budget LRU relation must be evicted and unpersisted")
      assert(b.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "the just-touched entry must survive eviction")
      assert(!graft.operators.Dedup.relCache.containsKey(
        graft.operators.Dedup.sessionId(spark) + ":/bytes/a:k"))
    } finally spark.conf.unset("spark.graft.cache.maxBytes")
  }
}
