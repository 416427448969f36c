package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Exact.{sql => S}
import graft.sources.{GraftTable, Tables}

/** §G lakehouse write-path operators, oracle-checked end to end: each
  * query builds a real GraftTable in a temp directory, runs the
  * mutation (MERGE / UPDATE / DELETE), and returns the final table
  * state — which the DuckDB oracle recomputes directly from the base
  * tables. This verifies the full write→commit→read cycle, not just the
  * expression logic (reference surface: 02_iceberg_demo.ipynb
  * UPDATE/DELETE, 03_delta_demo.ipynb INSERT OVERWRITE/mergeSchema).
  */
object LakehouseOps {

  private def tmp(): String =
    graft.TempRoots.create("graft_table_").toString + "/t"

  /** g1: MERGE INTO (upsert). Target = orders with key%3=0; source =
    * orders with key%2=0 at doubled price. Matched keys (key%6=0) take
    * the doubled price; other source keys insert; other target keys
    * survive. */
  val g1_merge_upsert: Relational.Q = (s, dir) => {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val target = orders.filter($"o_orderkey" % 3 === 0)
    val source = orders.filter($"o_orderkey" % 2 === 0)
      .withColumn("o_totalprice", $"o_totalprice" * 2)
    val t = GraftTable.create(s, tmp(), target)
    t.merge(source, Seq("o_orderkey"))
    t.read()
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 4).as("o_totalprice"))
      .orderBy($"o_orderkey")
  }

  val g1_sql: String =
    """SELECT o_orderkey, o_custkey,
      | ROUND(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
      |            ELSE o_totalprice END, 4) AS o_totalprice
      |FROM orders
      |WHERE o_orderkey % 3 = 0 OR o_orderkey % 2 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** g5: row-level UPDATE then DELETE, returning the final snapshot. */
  val g5_update_delete: Relational.Q = (s, dir) => {
    import s.implicits._
    val t = GraftTable.create(s, tmp(), Tables.customer(s, dir))
    t.update(col("c_acctbal") < 0, Map("c_acctbal" -> lit(0.0)))
    t.delete(col("c_mktsegment") === "MACHINERY")
    t.read()
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val g5_sql: String =
    """SELECT c_custkey, c_name,
      | CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
      | c_mktsegment
      |FROM customer WHERE c_mktsegment <> 'MACHINERY'
      |ORDER BY c_custkey""".stripMargin

  /** g7: the PURE-SQL table lifecycle through the DSv2 catalog plugin
    * ([[graft.sources.v2.GraftCatalog]]) — CREATE TABLE … USING graft,
    * INSERT INTO … SELECT, DELETE FROM … WHERE, then a SELECT aggregate
    * over the final table state, exactly how the reference drives its
    * lakehouse (02_iceberg_demo.ipynb / 03_delta_demo.ipynb run DDL/DML
    * only through spark.sql). The oracle recomputes the final state from
    * the base table. */
  val g7_sql_catalog: Relational.Q = (s, dir) => {
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.v2.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_cat.warehouse",
      graft.TempRoots.create("graft_wh_").toString)
    val tbl = s"graft_cat.db.orders_${java.util.UUID.randomUUID().toString.take(8)}"
    s.sql(s"""CREATE TABLE $tbl (
             |  o_orderkey BIGINT, o_custkey BIGINT,
             |  o_orderstatus STRING, o_totalprice DOUBLE) USING graft""".stripMargin)
    s.sql(s"""INSERT INTO $tbl
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM parquet.`$dir/orders.parquet`""".stripMargin)
    s.sql(s"DELETE FROM $tbl WHERE o_orderstatus = 'P'")
    s.sql(s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
             | ${S.moneySum("o_totalprice")} AS total
             |FROM $tbl GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  val g7_sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       | ${S.moneySum("o_totalprice")} AS total
       |FROM orders WHERE o_orderstatus <> 'P'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** g8: Delta Lake interop round-trip
    * ([[graft.sources.DeltaInterop]]) — build a GraftTable from orders,
    * run a row-level mutation, EXPORT the snapshot as a Delta table per
    * the public transaction-log protocol, then read it back through the
    * dependency-free Delta log reader. The oracle recomputes the final
    * state relationally, so the whole
    * commit-log → export → Delta-replay cycle must be value-exact —
    * the migration path the reference's Delta-resident data would take
    * (03_delta_demo.ipynb). */
  val g8_delta_roundtrip: Relational.Q = (s, dir) => {
    import s.implicits._
    val t = GraftTable.create(s, tmp(), Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice"))
    t.delete(col("o_orderstatus") === "P")
    val target = graft.TempRoots.create("graft_delta_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"o_orderkey", $"o_orderstatus",
        round($"o_totalprice", 4).as("o_totalprice"))
      .orderBy($"o_orderkey")
  }

  val g8_sql: String =
    """SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS o_totalprice
      |FROM orders WHERE o_orderstatus <> 'P'
      |ORDER BY o_orderkey""".stripMargin

  /** g9: Iceberg interop round-trip
    * ([[graft.sources.IcebergInterop]]) — build a GraftTable from
    * customer, run an UPDATE, EXPORT the snapshot as a file-based
    * Iceberg v1 table per the public Iceberg table spec (metadata.json
    * + Avro manifest list/manifest), then read it back through the
    * dependency-free Iceberg metadata reader. The oracle recomputes
    * the final state relationally, so the whole
    * commit-log → export → manifest-replay cycle must be value-exact —
    * Iceberg is the reference's PRIMARY table format
    * (02_iceberg_demo.ipynb, Polaris REST catalog). */
  val g9_iceberg_roundtrip: Relational.Q = (s, dir) => {
    import s.implicits._
    val t = GraftTable.create(s, tmp(), Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal"))
    t.update(col("c_acctbal") < 0, Map("c_acctbal" -> lit(0.0)))
    val target = graft.TempRoots.create("graft_iceberg_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        graft.functions.Exact.moneySum($"c_acctbal").as("total_bal"))
      .orderBy($"c_mktsegment")
  }

  val g9_sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_cust,
       | ${S.moneySum("CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END")} AS total_bal
       |FROM customer
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** g10: ZERO-COPY Delta mirror gate — build a GraftTable from
    * orders, append + delete across commits, `mirrorToDelta` (the
    * in-place `_delta_log` referencing graft's own files), then read
    * the TABLE ROOT back through the Delta log reader. The oracle
    * recomputes the final state relationally, so the mirror's
    * add/remove bookkeeping across a copy-on-write rewrite must be
    * value-exact. */
  val g10_delta_mirror: Relational.Q = (s, dir) => {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val t = GraftTable.create(s, tmp(), orders.filter($"o_orderkey" % 2 === 1))
    t.append(orders.filter($"o_orderkey" % 2 === 0))
    t.delete(col("o_orderstatus") === "F")
    graft.sources.DeltaInterop.mirrorToDelta(t)
    graft.sources.DeltaInterop.readDelta(s, t.root)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Exact.moneySum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  val g10_sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
       | ${S.moneySum("o_totalprice")} AS total
       |FROM orders WHERE o_orderstatus <> 'F'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** g11: zero-copy Iceberg mirror gate — same shape as g10 on the
    * Iceberg side (metadata/ in the table root, snapshot per commit),
    * over a different mutation mix (overwrite-free append + update). */
  val g11_iceberg_mirror: Relational.Q = (s, dir) => {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
    val t = GraftTable.create(s, tmp(), li.filter($"l_orderkey" % 2 === 1))
    t.append(li.filter($"l_orderkey" % 2 === 0))
    t.update(col("l_returnflag") === "R", Map("l_quantity" -> lit(0.0)))
    graft.sources.IcebergInterop.mirrorToIceberg(t)
    graft.sources.IcebergInterop.readIceberg(s, t.root)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Exact.moneySum($"l_quantity").as("total_qty"))
      .orderBy($"l_returnflag")
  }

  val g11_sql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_items,
       | ${S.moneySum("CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_quantity END")} AS total_qty
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** g12: Delta Change Data Feed gate — build a GraftTable from
    * supplier in TWO append commits (odd keys, then even), mirror
    * zero-copy, then read the mirror's change feed: every row must
    * come back as an `insert` stamped with the commit that added it.
    * The oracle recomputes both halves relationally (odd → version 0,
    * even → version 1), so the per-commit add attribution of
    * [[graft.sources.DeltaInterop.readDeltaChanges]] must be
    * value-exact. `_commit_timestamp` is wall-clock and excluded. */
  val g12_delta_cdf: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 2 === 1))
    t.append(sup.filter($"s_suppkey" % 2 === 0))
    graft.sources.DeltaInterop.mirrorToDelta(t)
    graft.sources.DeltaInterop.readDeltaChanges(s, t.root, 0, 1)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"),
        $"_change_type".as("change_type"),
        $"_commit_version".as("commit_version"))
      .orderBy($"s_suppkey")
  }

  val g12_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal,
      | 'insert' AS change_type,
      | CAST(CASE WHEN s_suppkey % 2 = 1 THEN 0 ELSE 1 END AS BIGINT)
      |   AS commit_version
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** Drain a foreign-format stream into a memory sink with
    * AvailableNow and return the sink table — the g13/g14 harness
    * (the stateless log-tailing streams need none of the state-store
    * shaping the h-family's drain does). */
  private def drainForeign(s: org.apache.spark.sql.SparkSession,
      format: String, path: String): org.apache.spark.sql.DataFrame = {
    val name = "gfs_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.format(format).load(path)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination()
    s.table(name)
  }

  /** g13: foreign-Delta STREAMING gate — mirror a two-commit
    * GraftTable zero-copy, stream THE MIRROR through
    * [[graft.sources.v2.DeltaSource]] (AvailableNow), and compare the
    * drained rows against the relational recomputation: the
    * log-tailing stream must deliver the exact table content. */
  val g13_delta_stream: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0))
    t.append(sup.filter($"s_suppkey" % 3 =!= 0))
    graft.sources.DeltaInterop.mirrorToDelta(t)
    drainForeign(s, "graft.sources.v2.DeltaSource", t.root)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g13_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g14: Iceberg STREAMING gate — the g13 shape through
    * [[graft.sources.v2.IcebergSource]] over the Iceberg mirror. */
  val g14_iceberg_stream: Relational.Q = (s, dir) => {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
    val t = GraftTable.create(s, tmp(), cust.filter($"c_custkey" % 3 === 0))
    t.append(cust.filter($"c_custkey" % 3 =!= 0))
    graft.sources.IcebergInterop.mirrorToIceberg(t)
    drainForeign(s, "graft.sources.v2.IcebergSource", t.root)
      .select($"c_custkey", $"c_mktsegment",
        round($"c_acctbal", 4).as("c_acctbal"))
      .orderBy($"c_custkey")
  }

  val g14_sql: String =
    """SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 4) AS c_acctbal
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** g15: foreign-Delta APPEND gate
    * ([[graft.sources.DeltaInterop.appendToDelta]]) — export part of
    * supplier as a standalone Delta table, APPEND the rest through the
    * optimistic foreign-commit path, and read the result back through
    * the log replay. The oracle recomputes the union relationally, so
    * the written parquet + dataChange add commit must be value-exact. */
  val g15_delta_append: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 4 === 0))
    val target = graft.TempRoots.create("graft_dappend_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 4 =!= 0), target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g15_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g16: STREAMING change-data-feed gate — mirror a two-commit
    * GraftTable, stream its CDF (`readChangeFeed=true` on
    * [[graft.sources.v2.DeltaSource]], V1 micro-batch path), and
    * compare the drained `_change_type`-tagged rows against the
    * relational recomputation — the streaming twin of g12. */
  val g16_delta_cdf_stream: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 2 === 1))
    t.append(sup.filter($"s_suppkey" % 2 === 0))
    graft.sources.DeltaInterop.mirrorToDelta(t)
    val name = "gcdf_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.format("graft.sources.v2.DeltaSource")
      .option("readChangeFeed", "true").load(t.root)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination()
    s.table(name)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"),
        $"_change_type".as("change_type"),
        $"_commit_version".as("commit_version"))
      .orderBy($"s_suppkey")
  }

  val g16_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal,
      | 'insert' AS change_type,
      | CAST(CASE WHEN s_suppkey % 2 = 1 THEN 0 ELSE 1 END AS BIGINT)
      |   AS commit_version
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g17: foreign-Iceberg APPEND gate
    * ([[graft.sources.IcebergInterop.appendToIceberg]]) — the Iceberg
    * twin of g15: export part of supplier as a standalone Iceberg v1
    * table, APPEND the rest as a fast-append snapshot through the
    * optimistic metadata-version commit, and read the result back
    * through the manifest reader. The oracle recomputes the union
    * relationally, so the written parquet + manifest + metadata chain
    * must be value-exact. */
  val g17_iceberg_append: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 4 === 0))
    val target = graft.TempRoots.create("graft_iappend_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 4 =!= 0), target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g17_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g18: foreign-Delta DELETE gate
    * ([[graft.sources.DeltaInterop.deleteFromDelta]]) — export supplier
    * as an identity-partitioned Delta table, row-level DELETE through
    * the copy-on-write foreign commit path (partial files rewritten,
    * full files removed), and read the result back through the log
    * replay. The oracle recomputes the filter relationally, so the
    * rewritten parquet + remove/add commit must be value-exact. */
  val g18_delta_delete: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_ddelete_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 3 === 0)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g18_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 3 <> 0 ORDER BY s_suppkey""".stripMargin

  /** g19: foreign-Iceberg DELETE gate
    * ([[graft.sources.IcebergInterop.deleteFromIceberg]]) — export
    * supplier as Iceberg, promote it to format v2, row-level DELETE as
    * a merge-on-read position-delete snapshot, and read the result
    * back through the manifest reader (which applies the deletes as a
    * distributed anti-join). The oracle recomputes the filter
    * relationally. */
  val g19_iceberg_delete: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_idelete_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    // the in-place edit invalidates the local FS checksum sidecar
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    graft.sources.IcebergInterop.deleteFromIceberg(s, target,
      $"s_suppkey" % 3 === 0)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g19_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 3 <> 0 ORDER BY s_suppkey""".stripMargin

  /** g20: foreign-Delta UPDATE gate
    * ([[graft.sources.DeltaInterop.updateDelta]]) — export supplier as
    * Delta, copy-on-write UPDATE with the assignment evaluated against
    * the pre-update row, read back through the log replay. The oracle
    * recomputes the CASE relationally. */
  val g20_delta_update: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dupdate_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.updateDelta(s, target,
      $"s_suppkey" % 2 === 0,
      Map("s_acctbal" -> ($"s_acctbal" + lit(1000.0))))
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g20_sql: String =
    """SELECT s_suppkey, s_nationkey,
      | ROUND(CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal + 1000.0
      |            ELSE s_acctbal END, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g21: foreign-Iceberg UPDATE gate
    * ([[graft.sources.IcebergInterop.updateIceberg]]) — export
    * supplier, promote to format v2, atomic merge-on-read UPDATE (one
    * overwrite snapshot: position deletes + transformed-row data
    * files), manifest-reader readback vs the relational CASE. */
  val g21_iceberg_update: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_iupdate_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    graft.sources.IcebergInterop.updateIceberg(s, target,
      $"s_suppkey" % 2 === 0,
      Map("s_acctbal" -> ($"s_acctbal" + lit(1000.0))))
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g21_sql: String =
    """SELECT s_suppkey, s_nationkey,
      | ROUND(CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal + 1000.0
      |            ELSE s_acctbal END, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g22: foreign-Delta MERGE gate
    * ([[graft.sources.DeltaInterop.mergeDelta]]) — export supplier as
    * partitioned Delta, upsert a source of updated + brand-new rows
    * through the CoW merge commit, read back through the log replay.
    * The oracle recomputes the upsert relationally. */
  val g22_delta_merge: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dmerge_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    val src = sup.filter($"s_suppkey" % 5 === 0)
      .withColumn("s_acctbal", $"s_acctbal" + lit(500.0))
      .unionByName(sup.filter($"s_suppkey" % 7 === 0)
        .withColumn("s_suppkey", $"s_suppkey" + lit(100000L)))
    graft.sources.DeltaInterop.mergeDelta(src, target, Seq("s_suppkey"))
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g22_sql: String =
    """SELECT * FROM (
      | SELECT s_suppkey, s_nationkey,
      |  ROUND(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 500.0
      |             ELSE s_acctbal END, 4) AS s_acctbal
      | FROM supplier
      | UNION ALL
      | SELECT s_suppkey + 100000, s_nationkey, ROUND(s_acctbal, 4)
      | FROM supplier WHERE s_suppkey % 7 = 0
      |) ORDER BY s_suppkey""".stripMargin

  /** g23: foreign-Iceberg MERGE gate
    * ([[graft.sources.IcebergInterop.mergeIceberg]]) — export supplier
    * as a partitioned format-v2 Iceberg table, upsert a source whose
    * updates MOVE rows across partitions (nationkey reassignment) plus
    * brand-new rows, as ONE atomic MoR overwrite snapshot; read back
    * through the manifest reader. The oracle recomputes relationally. */
  val g23_iceberg_merge: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_imerge_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    val src = sup.filter($"s_suppkey" % 5 === 0)
      .withColumn("s_acctbal", $"s_acctbal" + lit(500.0))
      .withColumn("s_nationkey", ($"s_nationkey" + lit(1)) % lit(25))
      .unionByName(sup.filter($"s_suppkey" % 7 === 0)
        .withColumn("s_suppkey", $"s_suppkey" + lit(100000L)))
    graft.sources.IcebergInterop.mergeIceberg(src, target, Seq("s_suppkey"))
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g23_sql: String =
    """SELECT * FROM (
      | SELECT s_suppkey,
      |  CASE WHEN s_suppkey % 5 = 0 THEN (s_nationkey + 1) % 25
      |       ELSE s_nationkey END AS s_nationkey,
      |  ROUND(CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 500.0
      |             ELSE s_acctbal END, 4) AS s_acctbal
      | FROM supplier
      | UNION ALL
      | SELECT s_suppkey + 100000, s_nationkey, ROUND(s_acctbal, 4)
      | FROM supplier WHERE s_suppkey % 7 = 0
      |) ORDER BY s_suppkey""".stripMargin

  /** g24: foreign-Delta OPTIMIZE gate
    * ([[graft.sources.DeltaInterop.optimizeDelta]]) — build a
    * partitioned Delta table through several small appends, bin-pack
    * it, and read back: compaction must be row-for-row invisible. */
  val g24_delta_optimize: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0),
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dopt_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 3 === 1), target)
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 3 === 2), target)
    graft.sources.DeltaInterop.optimizeDelta(s, target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g24_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g25: foreign-Delta checkpoint + log-cleanup gate
    * ([[graft.sources.DeltaInterop.checkpointDelta]]) — build a Delta
    * table through several commits, write a classic checkpoint, DELETE
    * every covered JSON commit, and read back: the checkpoint alone
    * must reconstruct the exact state. */
  val g25_delta_checkpoint: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 2 === 0),
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dcp_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 2 === 1), target)
    graft.sources.DeltaInterop.checkpointDelta(s, target)
    graft.sources.DeltaInterop.cleanupDeltaLog(s, target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g25_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g26: foreign-Iceberg compaction gate
    * ([[graft.sources.IcebergInterop.compactIceberg]]) — build a v2
    * Iceberg table through several small appends plus a MoR delete,
    * compact (applying + consuming the position deletes), read back:
    * the rewrite must be row-for-row invisible. */
  val g26_iceberg_compact: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0),
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_icompact_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 3 === 1), target)
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 3 === 2), target)
    graft.sources.IcebergInterop.deleteFromIceberg(s, target,
      $"s_suppkey" % 10 === 0)
    graft.sources.IcebergInterop.compactIceberg(s, target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g26_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 10 <> 0 ORDER BY s_suppkey""".stripMargin

  /** g27: foreign-Delta VACUUM gate
    * ([[graft.sources.DeltaInterop.vacuumDelta]]) — CoW-delete rows
    * (stranding the originals), vacuum at retention 0, read back:
    * physical cleanup must not change a single surviving row. */
  val g27_delta_vacuum: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dvac_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 4 === 0)
    graft.sources.DeltaInterop.vacuumDelta(s, target, retentionMs = 0L)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g27_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 4 <> 0 ORDER BY s_suppkey""".stripMargin

  /** g28: exactly-once foreign-Delta ingestion gate
    * ([[graft.sources.DeltaInterop.appendToDeltaTxn]]) — load supplier
    * in three epochs with every epoch REPLAYED (the restarted-stream
    * shape); the setTransaction watermark must land each batch exactly
    * once. */
  val g28_delta_txn: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0),
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dtxn_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    Seq(0L, 1L).foreach { epoch =>
      val chunk = sup.filter($"s_suppkey" % 3 === (epoch + 1))
      graft.sources.DeltaInterop.appendToDeltaTxn(chunk, target,
        "g28-loader", epoch)
      // zombie replay of the same epoch: must commit nothing
      graft.sources.DeltaInterop.appendToDeltaTxn(chunk, target,
        "g28-loader", epoch)
    }
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g28_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g29/g30: in-place CONVERT gates — register a plain
    * hive-partitioned parquet directory as a Delta
    * ([[graft.sources.DeltaInterop.convertParquetToDelta]]) or Iceberg
    * ([[graft.sources.IcebergInterop.convertParquetToIceberg]]) table
    * without moving data, then read through the format's own replay. */
  val g29_delta_convert: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val target = graft.TempRoots.create("graft_dcvt_").toString + "/t"
    sup.write.partitionBy("s_nationkey").parquet(target)
    graft.sources.DeltaInterop.convertParquetToDelta(s, target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nationkey"),
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g30_iceberg_convert: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val target = graft.TempRoots.create("graft_icvt_").toString + "/t"
    sup.write.partitionBy("s_nationkey").parquet(target)
    graft.sources.IcebergInterop.convertParquetToIceberg(s, target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nationkey"),
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g29_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g31: exactly-once foreign-Iceberg ingestion gate
    * ([[graft.sources.IcebergInterop.appendToIcebergTxn]]) — the
    * Iceberg twin of g28: three epochs, every one replayed; the
    * property watermark must land each batch exactly once. */
  val g31_iceberg_txn: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0),
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_itxn_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    Seq(0L, 1L).foreach { epoch =>
      val chunk = sup.filter($"s_suppkey" % 3 === (epoch + 1))
      graft.sources.IcebergInterop.appendToIcebergTxn(chunk, target,
        "g31-loader", epoch)
      graft.sources.IcebergInterop.appendToIcebergTxn(chunk, target,
        "g31-loader", epoch)
    }
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g32: Iceberg incremental append-scan gate
    * ([[graft.sources.IcebergInterop.readIcebergChanges]]) — seed a
    * third of supplier, append the other two thirds as two snapshots,
    * then sync ONLY what changed after the seed: each appended third
    * rides out tagged with its batch ordinal, and the seed never
    * re-scans. */
  val g32_iceberg_changes: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0))
    val target = graft.TempRoots.create("graft_ichg_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val seeded = graft.sources.IcebergInterop
      .icebergRefSnapshot(s, target, "main")
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 3 === 1), target)
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 3 === 2), target)
    graft.sources.IcebergInterop.readIcebergChanges(s, target, seeded)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"),
        $"_change_ordinal".as("batch"))
      .orderBy($"s_suppkey")
  }

  val g32_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal,
      |CAST(s_suppkey % 3 AS INT) AS batch
      |FROM supplier WHERE s_suppkey % 3 <> 0 ORDER BY s_suppkey""".stripMargin

  /** g33: Delta RESTORE gate
    * ([[graft.sources.DeltaInterop.restoreDelta]]) — export supplier,
    * land a corrupting CoW delete AND a garbage append, then restore
    * version 0 in one metadata commit: the read must be byte-identical
    * to the export, with zero data I/O spent undoing. */
  val g33_delta_restore: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_drst_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 4 === 0)
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" <= 5)
        .withColumn("s_acctbal", lit(-99999.0)), target)
    graft.sources.DeltaInterop.restoreDelta(s, target, 0L)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g34: Iceberg rollback gate
    * ([[graft.sources.IcebergInterop.rollbackIceberg]] +
    * [[graft.sources.IcebergInterop.tagIceberg]]) — tag the good
    * snapshot, land a corrupting append, roll the table back to the
    * tag: the read must be byte-identical to the pre-append state,
    * with zero data I/O spent undoing it. */
  val g34_iceberg_rollback: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_irb_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    graft.sources.IcebergInterop.tagIceberg(s, target, "good")
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" <= 5)
        .withColumn("s_acctbal", lit(-99999.0)), target)
    graft.sources.IcebergInterop.rollbackIceberg(s, target,
      graft.sources.IcebergInterop.icebergRefSnapshot(s, target, "good"))
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g34_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** g35: Delta SHALLOW CLONE gate
    * ([[graft.sources.DeltaInterop.cloneDelta]]) — clone supplier
    * zero-copy, then mutate ONLY the clone (CoW delete): the clone
    * reads the filtered state while the source must still read
    * complete (asserted in-query — divergence is the whole point). */
  val g35_delta_clone: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val src = graft.TempRoots.create("graft_clone_src_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, src)
    val dst = graft.TempRoots.create("graft_clone_dst_").toString + "/t"
    graft.sources.DeltaInterop.cloneDelta(s, src, dst)
    graft.sources.DeltaInterop.deleteFromDelta(s, dst,
      $"s_suppkey" % 4 === 0)
    require(graft.sources.DeltaInterop.readDelta(s, src).count() ==
      sup.count(), "clone mutation leaked into the source")
    graft.sources.DeltaInterop.readDelta(s, dst)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g36: Delta OPTIMIZE ZORDER BY gate
    * ([[graft.sources.DeltaInterop.optimizeDelta]] with `zorderBy`) —
    * re-cluster a partitioned export by (s_acctbal, s_suppkey); a pure
    * layout change, so the readback must be byte-identical to the
    * pre-optimize state. */
  val g36_delta_zorder: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_zord_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.optimizeDelta(s, target,
      targetFileBytes = 64L << 10, zorderBy = Seq("s_acctbal", "s_suppkey"))
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g37: UniForm-shape gate
    * ([[graft.sources.IcebergInterop.convertDeltaToIceberg]]) — a
    * FOREIGN Delta table (with a CoW delete in its history) gains
    * in-place Iceberg metadata; the Iceberg read of the shared files
    * must equal the relational recomputation. */
  val g37_delta_to_iceberg: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup, partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_d2i_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 4 === 0)
    graft.sources.IcebergInterop.convertDeltaToIceberg(s, target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g38: reverse UniForm gate
    * ([[graft.sources.DeltaInterop.convertIcebergToDelta]]) — a plain
    * parquet dump becomes Iceberg in place, then gains a Delta log
    * over the same files; the Delta read (plus a Delta-side append)
    * must equal the relational recomputation. */
  val g38_iceberg_to_delta: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val target = graft.TempRoots.create("graft_i2d_").toString + "/t"
    sup.filter($"s_suppkey" % 2 === 0)
      .write.partitionBy("s_nationkey").parquet(target)
    graft.sources.IcebergInterop.convertParquetToIceberg(s, target)
    graft.sources.DeltaInterop.convertIcebergToDelta(s, target)
    // hive partition inference types s_nationkey INT — match it
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 2 === 1)
        .withColumn("s_nationkey", $"s_nationkey".cast("int")), target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nationkey"),
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g39: merge-on-read Delta DELETE gate
    * ([[graft.sources.DeltaInterop.deleteFromDelta]] with
    * delta.enableDeletionVectors) — enable DVs via the
    * protocol-upgrading property commit, run two deletes (the second
    * MERGES vectors), read back through the DV-filtering replay: no
    * data file is rewritten, yet the rows must match the relational
    * recomputation exactly. */
  val g39_delta_dv_delete: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dvdel_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.setDeltaProperties(s, target,
      Map("delta.enableDeletionVectors" -> "true"))
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 4 === 0)
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 7 === 0)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g39_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 4 <> 0 AND s_suppkey % 7 <> 0
      |ORDER BY s_suppkey""".stripMargin

  /** g40: FULL-CLAUSE foreign-Delta MERGE gate
    * ([[graft.sources.DeltaInterop.mergeDeltaClauses]]) — export
    * supplier as partitioned Delta, then one merge exercising every
    * clause family: `WHEN MATCHED AND bal<0 THEN DELETE`, `WHEN
    * MATCHED THEN UPDATE SET bal = src.bal + 1` (partial SET reading
    * the source row), `WHEN NOT MATCHED AND bal>5000 THEN INSERT`,
    * and `WHEN NOT MATCHED BY SOURCE AND key%5=0 THEN DELETE`
    * (full-sync). The oracle recomputes all four dispositions
    * relationally. */
  val g40_delta_merge_clauses: Relational.Q = (s, dir) => {
    import s.implicits._
    import graft.sources.Merge
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dmc_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    val src = sup.filter($"s_suppkey" % 2 === 0)
      .withColumn("s_acctbal", $"s_acctbal" + lit(500.0))
      .unionByName(sup.filter($"s_suppkey" % 7 === 0)
        .withColumn("s_suppkey", $"s_suppkey" + lit(100000L)))
    graft.sources.DeltaInterop.mergeDeltaClauses(src, target,
      Seq("s_suppkey"),
      matched = Seq(
        Merge.MatchedDelete(Some($"s_acctbal" < 0)),
        Merge.MatchedUpdate(None,
          Map("s_acctbal" -> (Merge.source("s_acctbal") + lit(1.0))))),
      notMatched = Seq(
        Merge.NotMatchedInsert(Some($"s_acctbal" > 5000))),
      notMatchedBySource = Seq(
        Merge.BySourceDelete(Some($"s_suppkey" % 5 === 0))))
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g40_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM (
      | SELECT s_suppkey, s_nationkey, s_acctbal + 501.0 AS s_acctbal
      | FROM supplier WHERE s_suppkey % 2 = 0 AND s_acctbal >= 0
      | UNION ALL
      | SELECT s_suppkey, s_nationkey, s_acctbal
      | FROM supplier WHERE s_suppkey % 2 = 1 AND s_suppkey % 5 <> 0
      | UNION ALL
      | SELECT s_suppkey + 100000, s_nationkey, s_acctbal
      | FROM supplier WHERE s_suppkey % 7 = 0 AND s_acctbal > 5000
      |) ORDER BY s_suppkey""".stripMargin

  /** g41: merge-on-read Delta UPDATE + MERGE gate — with
    * delta.enableDeletionVectors, [[graft.sources.DeltaInterop.updateDelta]]
    * and [[graft.sources.DeltaInterop.mergeDelta]] retire matched rows
    * through MERGED deletion vectors and append only the transformed
    * rows (O(changed rows), no data file rewritten — asserted
    * in-query via the commit's actions), then the DV-filtering replay
    * must match the relational recomputation exactly. */
  val g41_delta_dv_update_merge: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_dvum_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.setDeltaProperties(s, target,
      Map("delta.enableDeletionVectors" -> "true"))
    val updV = graft.sources.DeltaInterop.updateDelta(s, target,
      $"s_suppkey" % 2 === 0,
      Map("s_acctbal" -> ($"s_acctbal" + lit(1000.0))))
    // the UPDATE commit re-adds files with deletion vectors instead of
    // rewriting them — the merge-on-read contract, asserted here
    val updLog = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target, "_delta_log",
        f"$updV%020d.json")), "UTF-8")
    require(updLog.contains("\"deletionVector\""),
      "DV-mode UPDATE must strike rows through deletion vectors")
    val src = sup.filter($"s_suppkey" % 3 === 0)
      .withColumn("s_acctbal", lit(77.0))
      .unionByName(sup.filter($"s_suppkey" % 11 === 0)
        .withColumn("s_suppkey", $"s_suppkey" + lit(200000L))
        .withColumn("s_acctbal", lit(88.0)))
    graft.sources.DeltaInterop.mergeDelta(src, target, Seq("s_suppkey"))
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g41_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(bal, 4) AS s_acctbal
      |FROM (
      | SELECT s_suppkey, s_nationkey,
      |  CASE WHEN s_suppkey % 3 = 0 THEN 77.0
      |       WHEN s_suppkey % 2 = 0 THEN s_acctbal + 1000.0
      |       ELSE s_acctbal END AS bal
      | FROM supplier
      | UNION ALL
      | SELECT s_suppkey + 200000, s_nationkey, 88.0
      | FROM supplier WHERE s_suppkey % 11 = 0
      |) ORDER BY s_suppkey""".stripMargin

  /** g42: Iceberg EQUALITY-DELETE gate
    * ([[graft.sources.IcebergInterop.deleteFromIcebergByKey]]) —
    * export supplier as v2, delete keys s_suppkey%4=0 as a pure
    * content-2 equality-delete commit (no detection scan), then
    * RE-APPEND the %8=0 subset: the spec's sequence-number guard must
    * let the re-inserts survive the earlier delete. The oracle
    * recomputes both effects relationally. */
  val g42_iceberg_eq_delete: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_ieqd_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    graft.sources.IcebergInterop.deleteFromIcebergByKey(
      sup.filter($"s_suppkey" % 4 === 0).select($"s_suppkey"), target)
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 8 === 0), target)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g42_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 4 <> 0 OR s_suppkey % 8 = 0
      |ORDER BY s_suppkey""".stripMargin

  /** g43: FULL-CLAUSE foreign-Iceberg MERGE gate
    * ([[graft.sources.IcebergInterop.mergeIcebergClauses]]) — the g40
    * clause mix in its merge-on-read shape: one atomic overwrite
    * snapshot whose position deletes retire every clause-hit row
    * (matched DELETE + matched partial-SET + by-source DELETE) and
    * whose data files carry the transformed + conditionally-inserted
    * rows. Same oracle as g40 — the clause semantics must agree
    * across formats. */
  val g43_iceberg_merge_clauses: Relational.Q = (s, dir) => {
    import s.implicits._
    import graft.sources.Merge
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup,
      partitionBy = Seq("s_nationkey"))
    val target = graft.TempRoots.create("graft_imc_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    val src = sup.filter($"s_suppkey" % 2 === 0)
      .withColumn("s_acctbal", $"s_acctbal" + lit(500.0))
      .unionByName(sup.filter($"s_suppkey" % 7 === 0)
        .withColumn("s_suppkey", $"s_suppkey" + lit(100000L)))
    graft.sources.IcebergInterop.mergeIcebergClauses(src, target,
      Seq("s_suppkey"),
      matched = Seq(
        Merge.MatchedDelete(Some($"s_acctbal" < 0)),
        Merge.MatchedUpdate(None,
          Map("s_acctbal" -> (Merge.source("s_acctbal") + lit(1.0))))),
      notMatched = Seq(
        Merge.NotMatchedInsert(Some($"s_acctbal" > 5000))),
      notMatchedBySource = Seq(
        Merge.BySourceDelete(Some($"s_suppkey" % 5 === 0))))
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g44: Iceberg v3 DELETION-VECTOR gate
    * ([[graft.sources.IcebergInterop.deleteFromIceberg]] on a format-v3
    * table) — two deletes land as Puffin deletion-vector commits, the
    * second MERGING each affected file's vector (the spec's
    * at-most-one-DV rule), no data file rewritten; the DV-filtering
    * replay must match the relational recomputation exactly. Same
    * oracle as g39 — Delta DVs and Iceberg v3 DVs share semantics
    * (and the bitmap serialization). */
  val g44_iceberg_v3_dv: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create("graft_iv3dv_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 3")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    graft.sources.IcebergInterop.deleteFromIceberg(s, target,
      $"s_suppkey" % 4 === 0)
    graft.sources.IcebergInterop.deleteFromIceberg(s, target,
      $"s_suppkey" % 7 === 0)
    graft.sources.IcebergInterop.readIceberg(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g45: Delta ROW TRACKING lifecycle gate — enable the feature via
    * the protocol-upgrading property commit, append a ROW-TRACKED
    * batch (baseRowId + defaultRowCommitVersion assigned, watermark
    * advanced), run a DV DELETE and a DV UPDATE, and assert IN-QUERY
    * from the raw log that the surviving files' ids were carried
    * unchanged — then return the final state for the relational
    * oracle. */
  val g45_delta_row_tracking: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 2 === 1))
    val target = graft.TempRoots.create("graft_rt45_").toString + "/t"
    graft.sources.DeltaInterop.exportSnapshot(t, target)
    graft.sources.DeltaInterop.setDeltaProperties(s, target,
      Map("delta.enableRowTracking" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 2 === 0), target)
    val (before, wm0) = graft.sources.DeltaInterop.deltaRowIds(s, target)
    val tracked = before.filter(_._2._1.isDefined)
    require(tracked.nonEmpty && wm0.isDefined,
      "g45: the append must assign row ids and advance the watermark")
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_suppkey" % 6 === 0)
    graft.sources.DeltaInterop.updateDelta(s, target,
      $"s_suppkey" % 11 === 0,
      Map("s_acctbal" -> ($"s_acctbal" + lit(100.0))))
    val (after, _) = graft.sources.DeltaInterop.deltaRowIds(s, target)
    tracked.foreach { case (p, ids) =>
      after.get(p).foreach(got => require(got == ids,
        s"g45: DV DML must carry row ids unchanged for $p"))
    }
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val g45_sql: String =
    """SELECT s_suppkey, s_nationkey,
      |  ROUND(CASE WHEN s_suppkey % 11 = 0 THEN s_acctbal + 100.0
      |             ELSE s_acctbal END, 4) AS s_acctbal
      |FROM supplier WHERE s_suppkey % 6 <> 0
      |ORDER BY s_suppkey""".stripMargin

  /** g46: SQL VIEWS end to end — the ViewCatalog face the REST
    * catalog's `/v1/…/views` routes share: CREATE VIEW through the
    * graft SQL catalog, then aggregate THROUGH the view; the oracle
    * recomputes the same query over the base table directly. */
  val g46_sql_views: Relational.Q = (s, dir) => {
    import s.implicits._
    val cat = "gviewq"
    if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse",
        graft.TempRoots.create("graft_vw46_").toString)
    }
    val name = "t" + java.util.UUID.randomUUID().toString.replace("-", "")
    s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    val wh = s.conf.get(s"spark.sql.catalog.$cat.warehouse")
    GraftTable.create(s, s"$wh/db/$name",
      Tables.lineitem(s, dir).select($"l_orderkey", $"l_quantity"))
    s.sql(s"CREATE VIEW $cat.db.${name}_v AS " +
      s"SELECT l_orderkey, l_quantity FROM $cat.db.$name " +
      "WHERE l_quantity > 30")
    s.sql(s"SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS qty, " +
      s"COUNT(*) AS n FROM $cat.db.${name}_v " +
      "GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 500")
  }

  val g46_sql: String =
    """SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS qty, COUNT(*) AS n
      |FROM lineitem WHERE l_quantity > 30
      |GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 500""".stripMargin

  /** g47: plain SQL DML on a raw FOREIGN Delta root — the reference
    * notebooks' `UPDATE … SET` / `DELETE FROM` / `MERGE INTO` cells
    * run verbatim against `cat.delta.`/root``
    * (plans/ForeignDml.scala dispatches to the interop writers); the
    * oracle recomputes the three-step lifecycle over the base table. */
  val g47_foreign_sql_dml: Relational.Q = (s, dir) => {
    import s.implicits._
    foreignSqlDml(s, dir, "delta")
  }

  /** g48: the identical verbatim-SQL lifecycle against a raw Iceberg
    * v2 root (merge-on-read position deletes under the hood). */
  val g48_foreign_sql_dml_iceberg: Relational.Q = (s, dir) => {
    import s.implicits._
    foreignSqlDml(s, dir, "iceberg")
  }

  private def foreignSqlDml(s: org.apache.spark.sql.SparkSession, dir: String,
      format: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cat = "gdmlq"
    if (s.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse",
        graft.TempRoots.create("graft_dml47_wh_").toString)
    }
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup)
    val target = graft.TempRoots.create(s"graft_dml47_$format").toString + "/t"
    if (format == "delta")
      graft.sources.DeltaInterop.exportSnapshot(t, target): Unit
    else {
      graft.sources.IcebergInterop.exportSnapshot(t, target)
      val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
      Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
        .replace("\"format-version\" : 1", "\"format-version\" : 2")
        .getBytes("UTF-8"))
      Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
        ".v1.metadata.json.crc")): Unit
    }
    val ref = s"$cat.$format.`$target`"
    s.sql(s"UPDATE $ref SET s_acctbal = s_acctbal + 50 WHERE s_suppkey % 7 = 0")
    s.sql(s"DELETE FROM $ref WHERE s_nationkey = 3")
    val srcView = "dml47_src_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    sup.filter($"s_suppkey" % 10 === 0)
      .withColumn("s_acctbal", lit(-1.0))
      .unionByName(sup.select(($"s_suppkey" + 100000).as("s_suppkey"),
        $"s_nationkey", lit(-1.0).as("s_acctbal")))
      .createOrReplaceTempView(srcView)
    s.sql(s"MERGE INTO $ref t USING $srcView src " +
      "ON t.s_suppkey = src.s_suppkey " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    s.sql(s"SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal " +
      s"FROM $ref ORDER BY s_suppkey")
  }

  val g47_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(bal, 4) AS s_acctbal FROM (
      |  SELECT s_suppkey, s_nationkey,
      |    CASE WHEN s_suppkey % 10 = 0 THEN -1.0
      |         WHEN s_suppkey % 7 = 0 THEN s_acctbal + 50
      |         ELSE s_acctbal END AS bal
      |  FROM supplier WHERE s_nationkey <> 3
      |  UNION ALL
      |  SELECT s_suppkey, s_nationkey, -1.0 AS bal FROM supplier
      |  WHERE s_nationkey = 3 AND s_suppkey % 10 = 0
      |  UNION ALL
      |  SELECT s_suppkey + 100000 AS s_suppkey, s_nationkey, -1.0 AS bal
      |  FROM supplier
      |) ORDER BY s_suppkey""".stripMargin

  /** g49: Iceberg STREAMING CHANGELOG gate
    * ([[graft.sources.v2.IcebergSource]] with
    * `option("readChangeFeed", "true")`, backed by
    * [[graft.sources.IcebergInterop.readIcebergChangelog]]) — seed a
    * third of supplier, append another third (an `append` snapshot),
    * then MoR-delete the even half of the seed (a position-delete
    * snapshot); an AvailableNow drain pinned after the seed must emit
    * the appended rows as `insert` (ordinal 1) and the struck rows as
    * DECODED `delete` rows (ordinal 2) — the g16 twin, exercising the
    * change-snapshot decode a plain snapshot tail refuses. */
  val g49_iceberg_cdf_stream: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val t = GraftTable.create(s, tmp(), sup.filter($"s_suppkey" % 3 === 0))
    val target = graft.TempRoots.create("graft_icdc_").toString + "/t"
    graft.sources.IcebergInterop.exportSnapshot(t, target)
    val mdPath = java.nio.file.Paths.get(target, "metadata", "v1.metadata.json")
    Files.write(mdPath, new String(Files.readAllBytes(mdPath), "UTF-8")
      .replace("\"format-version\" : 1", "\"format-version\" : 2")
      .getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(target, "metadata",
      ".v1.metadata.json.crc"))
    val seeded = graft.sources.IcebergInterop
      .icebergRefSnapshot(s, target, "main")
    graft.sources.IcebergInterop.appendToIceberg(
      sup.filter($"s_suppkey" % 3 === 1), target)
    graft.sources.IcebergInterop.deleteFromIceberg(s, target,
      $"s_suppkey" % 6 === 0)
    val name = "gicdc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.format("graft.sources.v2.IcebergSource")
      .option("readChangeFeed", "true")
      .option("startingSnapshotId", seeded.toString)
      .load(target)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination()
    s.table(name)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"),
        $"_change_type".as("change_type"),
        $"_change_ordinal".as("ordinal"))
      .orderBy($"s_suppkey", $"change_type")
  }

  val g49_sql: String =
    """SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal,
      | 'insert' AS change_type, CAST(1 AS INT) AS ordinal
      |FROM supplier WHERE s_suppkey % 3 = 1
      |UNION ALL
      |SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 4) AS s_acctbal,
      | 'delete' AS change_type, CAST(2 AS INT) AS ordinal
      |FROM supplier WHERE s_suppkey % 6 = 0
      |ORDER BY s_suppkey, change_type""".stripMargin

  /** g50: COLUMN-MAPPED Delta DML gate — the g47 lifecycle (keyed
    * UPDATE, keyed DELETE, upsert MERGE, then
    * OPTIMIZE) through the Scala verbs against a NAME-MODE
    * column-mapped Delta root whose physical parquet names differ
    * from every logical column (the post-ALTER-RENAME shape of the
    * reference's Delta 3.2 tables). Every verb must resolve logical
    * predicates/assignments against physical file columns and write
    * physical-named rewrites; the oracle checks the final state
    * relationally, so one wrong name anywhere hash-fails. */
  /** Bootstrap a NAME-mode column-mapped Delta table over supplier
    * projection rows: data files under PHYSICAL names c1/c2/c3, one
    * commit-0 log declaring the logical schema through
    * delta.columnMapping metadata — the layout every post-RENAME
    * Delta 3.x table has (shared by g50/g51). */
  private def mappedSupplierBootstrap(seed: org.apache.spark.sql.DataFrame,
      target: String, tableId: String): Unit = {
    val s = seed.sparkSession
    import s.implicits._
    // physical files must carry the DECLARED types (s_nationkey is
    // int32 in the testdata, bigint in the mapped schema)
    seed.select($"s_suppkey".cast("bigint").as("c1"),
      $"s_nationkey".cast("bigint").as("c2"),
      $"s_acctbal".cast("double").as("c3")).coalesce(4).write.parquet(target)
    def meta(phys: String, id: Int) =
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id).build()
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s_suppkey",
        org.apache.spark.sql.types.LongType, nullable = true, meta("c1", 1)),
      org.apache.spark.sql.types.StructField("s_nationkey",
        org.apache.spark.sql.types.LongType, nullable = true, meta("c2", 2)),
      org.apache.spark.sql.types.StructField("s_acctbal",
        org.apache.spark.sql.types.DoubleType, nullable = true,
        meta("c3", 3)))).json
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    val dirPath = java.nio.file.Paths.get(target)
    val adds = java.nio.file.Files.list(dirPath).iterator()
    val addActions = Seq.newBuilder[String]
    while (adds.hasNext) {
      val p = adds.next()
      val n = p.getFileName.toString
      if (n.endsWith(".parquet"))
        addActions += s"""{"add":{"path":"${esc(n)}","partitionValues":{},"size":${java.nio.file.Files.size(p)},"modificationTime":1,"dataChange":true}}"""
    }
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(target, "_delta_log"))
    Files.write(java.nio.file.Paths.get(target, "_delta_log",
      "0" * 20 + ".json"), (Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"$tableId","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson)}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"},"createdTime":1}}"""
    ) ++ addActions.result()).mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  val g50_delta_mapped_dml: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val target = graft.TempRoots.create("graft_dml50_").toString + "/t"
    mappedSupplierBootstrap(sup, target, "g50")
    graft.sources.DeltaInterop.updateDelta(s, target,
      $"s_suppkey" % 7 === 0,
      Map("s_acctbal" -> ($"s_acctbal" + 50)))
    graft.sources.DeltaInterop.deleteFromDelta(s, target,
      $"s_nationkey" === 3)
    val src = sup.filter($"s_suppkey" % 10 === 0)
      .withColumn("s_acctbal", lit(-1.0))
      .unionByName(sup.select(($"s_suppkey" + 100000).as("s_suppkey"),
        $"s_nationkey", lit(-1.0).as("s_acctbal")))
    graft.sources.DeltaInterop.mergeDelta(src, target, Seq("s_suppkey"))
    graft.sources.DeltaInterop.optimizeDelta(s, target)
    graft.sources.DeltaInterop.readDelta(s, target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  /** g51 (r16): COLUMN-MAPPED Delta table through the PLAIN streaming
    * source — the g13 shape over a mapped mirror: seed a name-mode
    * mapped table with a third of supplier, APPEND the rest through
    * the physical-name writer, and drain via
    * [[graft.sources.v2.DeltaSource]] WITHOUT readChangeFeed. The
    * stream scans under the pinned physical schema in planned field
    * order (positionally identical rows), so the drained content must
    * equal the relational recomputation — the first thing a pipeline
    * does to a renamed-column Delta 3.x table. */
  val g51_delta_mapped_stream: Relational.Q = (s, dir) => {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
    val target = graft.TempRoots.create("graft_dms51_").toString + "/t"
    mappedSupplierBootstrap(sup.filter($"s_suppkey" % 3 === 0), target, "g51")
    graft.sources.DeltaInterop.appendToDelta(
      sup.filter($"s_suppkey" % 3 =!= 0)
        .select($"s_suppkey".cast("bigint").as("s_suppkey"),
          $"s_nationkey".cast("bigint").as("s_nationkey"),
          $"s_acctbal".cast("double").as("s_acctbal")), target)
    drainForeign(s, "graft.sources.v2.DeltaSource", target)
      .select($"s_suppkey", $"s_nationkey",
        round($"s_acctbal", 4).as("s_acctbal"))
      .orderBy($"s_suppkey")
  }

  val queries: Map[String, Relational.Q] = Map(
    "g51_delta_mapped_stream" -> g51_delta_mapped_stream,
    "g49_iceberg_cdf_stream" -> g49_iceberg_cdf_stream,
    "g50_delta_mapped_dml" -> g50_delta_mapped_dml,
    "g47_foreign_sql_dml" -> g47_foreign_sql_dml,
    "g48_foreign_sql_dml_iceberg" -> g48_foreign_sql_dml_iceberg,
    "g46_sql_views" -> g46_sql_views,
    "g45_delta_row_tracking" -> g45_delta_row_tracking,
    "g44_iceberg_v3_dv" -> g44_iceberg_v3_dv,
    "g43_iceberg_merge_clauses" -> g43_iceberg_merge_clauses,
    "g42_iceberg_eq_delete" -> g42_iceberg_eq_delete,
    "g41_delta_dv_update_merge" -> g41_delta_dv_update_merge,
    "g40_delta_merge_clauses" -> g40_delta_merge_clauses,
    "g39_delta_dv_delete" -> g39_delta_dv_delete,
    "g37_delta_to_iceberg" -> g37_delta_to_iceberg,
    "g38_iceberg_to_delta" -> g38_iceberg_to_delta,
    "g32_iceberg_changes" -> g32_iceberg_changes,
    "g33_delta_restore" -> g33_delta_restore,
    "g35_delta_clone" -> g35_delta_clone,
    "g36_delta_zorder" -> g36_delta_zorder,
    "g34_iceberg_rollback" -> g34_iceberg_rollback,
    "g31_iceberg_txn" -> g31_iceberg_txn,
    "g29_delta_convert" -> g29_delta_convert,
    "g30_iceberg_convert" -> g30_iceberg_convert,
    "g28_delta_txn" -> g28_delta_txn,
    "g27_delta_vacuum" -> g27_delta_vacuum,
    "g26_iceberg_compact" -> g26_iceberg_compact,
    "g25_delta_checkpoint" -> g25_delta_checkpoint,
    "g24_delta_optimize" -> g24_delta_optimize,
    "g23_iceberg_merge" -> g23_iceberg_merge,
    "g22_delta_merge" -> g22_delta_merge,
    "g21_iceberg_update" -> g21_iceberg_update,
    "g20_delta_update" -> g20_delta_update,
    "g19_iceberg_delete" -> g19_iceberg_delete,
    "g18_delta_delete" -> g18_delta_delete,
    "g13_delta_stream" -> g13_delta_stream,
    "g14_iceberg_stream" -> g14_iceberg_stream,
    "g12_delta_cdf" -> g12_delta_cdf,
    "g15_delta_append" -> g15_delta_append,
    "g16_delta_cdf_stream" -> g16_delta_cdf_stream,
    "g17_iceberg_append" -> g17_iceberg_append,
    "g1_merge_upsert" -> g1_merge_upsert,
    "g5_update_delete" -> g5_update_delete,
    "g7_sql_catalog" -> g7_sql_catalog,
    "g8_delta_roundtrip" -> g8_delta_roundtrip,
    "g9_iceberg_roundtrip" -> g9_iceberg_roundtrip,
    "g10_delta_mirror" -> g10_delta_mirror,
    "g11_iceberg_mirror" -> g11_iceberg_mirror,
  )

  val oracles: Map[String, String] = Map(
    // g51 streams the full supplier projection out of a mapped table —
    // the drained state is what g13's oracle already recomputes
    "g51_delta_mapped_stream" -> g13_sql,
    "g49_iceberg_cdf_stream" -> g49_sql,
    // g50 runs the g47 DML lifecycle through the Scala verbs against a
    // column-mapped root; the final state is format-independent, so
    // g47's oracle is the correct one here too.
    "g50_delta_mapped_dml" -> g47_sql,
    "g47_foreign_sql_dml" -> g47_sql,
    // g48 runs g47's EXACT DML lifecycle against an Iceberg root
    // instead of a Delta root, and the oracle checks only the
    // format-independent FINAL table state — so the same SQL is the
    // correct oracle for both. If g48's Scala lifecycle ever diverges
    // from g47's, split this alias.
    "g48_foreign_sql_dml_iceberg" -> g47_sql,
    "g46_sql_views" -> g46_sql,
    "g45_delta_row_tracking" -> g45_sql,
    "g44_iceberg_v3_dv" -> g39_sql,
    "g43_iceberg_merge_clauses" -> g40_sql,
    "g42_iceberg_eq_delete" -> g42_sql,
    "g41_delta_dv_update_merge" -> g41_sql,
    "g40_delta_merge_clauses" -> g40_sql,
    "g39_delta_dv_delete" -> g39_sql,
    "g37_delta_to_iceberg" -> g27_sql,
    "g38_iceberg_to_delta" -> g28_sql,
    "g32_iceberg_changes" -> g32_sql,
    "g33_delta_restore" -> g34_sql,
    "g35_delta_clone" -> g27_sql,
    "g36_delta_zorder" -> g34_sql,
    "g34_iceberg_rollback" -> g34_sql,
    "g31_iceberg_txn" -> g28_sql,
    "g29_delta_convert" -> g29_sql,
    "g30_iceberg_convert" -> g29_sql,
    "g28_delta_txn" -> g28_sql,
    "g27_delta_vacuum" -> g27_sql,
    "g26_iceberg_compact" -> g26_sql,
    "g25_delta_checkpoint" -> g25_sql,
    "g24_delta_optimize" -> g24_sql,
    "g23_iceberg_merge" -> g23_sql,
    "g22_delta_merge" -> g22_sql,
    "g21_iceberg_update" -> g21_sql,
    "g20_delta_update" -> g20_sql,
    "g19_iceberg_delete" -> g19_sql,
    "g18_delta_delete" -> g18_sql,
    "g13_delta_stream" -> g13_sql,
    "g14_iceberg_stream" -> g14_sql,
    "g12_delta_cdf" -> g12_sql,
    "g15_delta_append" -> g15_sql,
    "g16_delta_cdf_stream" -> g16_sql,
    "g17_iceberg_append" -> g17_sql,
    "g1_merge_upsert" -> g1_sql,
    "g5_update_delete" -> g5_sql,
    "g7_sql_catalog" -> g7_sql,
    "g8_delta_roundtrip" -> g8_sql,
    "g9_iceberg_roundtrip" -> g9_sql,
    "g10_delta_mirror" -> g10_sql,
    "g11_iceberg_mirror" -> g11_sql,
  )
}
