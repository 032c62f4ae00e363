package graft.queries

import graft.lake.LakeCatalog
import graft.mv.{CreateMaterializedViewCommand, MvCatalog, MvCommands, RefreshMaterializedViewCommand}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate coverage for the lakehouse engine: each entry creates
  * its own uniquely-named table in a per-JVM temp warehouse, drives a
  * SURVEY.md §2 operator surface (CTAS, inserts, DELETE/UPDATE/MERGE,
  * dynamic overwrite, time travel, branches, schema evolution,
  * incremental reads, compaction, changelog, MV), and returns a
  * DataFrame whose content is expressible as DuckDB SQL over the
  * SOURCE parquet tables — so the generic oracle harness verifies the
  * engine's end-to-end semantics, not just its unit tests.
  *
  * The side effects run eagerly inside the builder; only the final
  * SELECT is returned lazily (tables are left in the temp warehouse
  * so the driver can materialize the result after return).
  */
object LakeOps {

  private val wh = sys.props("java.io.tmpdir") +
    "/graft_lakeq_" + java.util.UUID.randomUUID().toString.take(8)

  private[queries] def cat(s: SparkSession): String = {
    s.conf.set("spark.sql.catalog.lakeq", classOf[LakeCatalog].getName)
    s.conf.set("spark.sql.catalog.lakeq.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS lakeq.db")
    "lakeq"
  }

  private[queries] def fresh(prefix: String): String =
    s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  private def srcView(s: SparkSession, d: String, table: String): String = {
    val v = fresh(s"src_$table")
    graft.Tables.load(s, d, table).createOrReplaceTempView(v)
    v
  }

  /** CTAS + plain read-back. */
  def lakeCtas(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "region")
    val t = fresh("ctas")
    s.sql(s"CREATE TABLE lakeq.db.$t USING lake AS SELECT r_regionkey, r_name FROM $v")
    s.sql(s"SELECT r_regionkey, r_name FROM lakeq.db.$t ORDER BY r_regionkey")
  }

  /** Two append snapshots reassemble the source. */
  def lakeInsert(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("ins")
    s.sql(s"CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_name string) USING lake")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v WHERE n_nationkey < 12")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v WHERE n_nationkey >= 12")
    s.sql(s"SELECT n_nationkey, n_name FROM lakeq.db.$t ORDER BY n_nationkey")
  }

  /** Copy-on-write DELETE. */
  def lakeDelete(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "customer")
    val t = fresh("del")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT c_custkey, c_name, c_mktsegment FROM $v""".stripMargin)
    s.sql(s"DELETE FROM lakeq.db.$t WHERE c_mktsegment = 'BUILDING'")
    s.sql(s"SELECT c_custkey, c_name, c_mktsegment FROM lakeq.db.$t ORDER BY c_custkey")
  }

  /** Row-level UPDATE. */
  def lakeUpdate(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "supplier")
    val t = fresh("upd")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT s_suppkey, s_nationkey, s_acctbal FROM $v""".stripMargin)
    s.sql(s"UPDATE lakeq.db.$t SET s_acctbal = s_acctbal + 1000 WHERE s_nationkey = 5")
    s.sql(s"""SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS bal
             |FROM lakeq.db.$t ORDER BY s_suppkey""".stripMargin)
  }

  /** MERGE with matched-update, not-matched-insert and
    * not-matched-by-source-delete. */
  def lakeMerge(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "customer")
    val t = fresh("mrg")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT c_custkey, c_name, c_acctbal AS bal FROM $v
             |WHERE c_custkey <= 100""".stripMargin)
    s.sql(s"""MERGE INTO lakeq.db.$t t USING (
             |  SELECT c_custkey, c_name, c_acctbal + 1000 AS bal FROM $v
             |  WHERE c_custkey BETWEEN 51 AND 150) s
             |ON t.c_custkey = s.c_custkey
             |WHEN MATCHED THEN UPDATE SET t.bal = s.bal
             |WHEN NOT MATCHED THEN INSERT *
             |WHEN NOT MATCHED BY SOURCE AND t.c_custkey <= 10 THEN DELETE""".stripMargin)
    s.sql(s"""SELECT c_custkey, c_name, round(bal, 2) AS bal
             |FROM lakeq.db.$t ORDER BY c_custkey""".stripMargin)
  }

  /** Snapshot isolation: read the pre-delete version. */
  def lakeTimeTravel(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("tt")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT n_nationkey, n_name FROM $v""".stripMargin)
    val v1 = s.sql(s"SELECT min(snapshot_id) FROM lakeq.db.$t.snapshots")
      .collect()(0).getLong(0)
    s.sql(s"DELETE FROM lakeq.db.$t WHERE n_nationkey >= 10")
    s.sql(s"""SELECT n_nationkey, n_name FROM lakeq.db.$t VERSION AS OF $v1
             |ORDER BY n_nationkey""".stripMargin)
  }

  /** Branch writes stay off main (write-audit without publish). */
  def lakeBranchIsolation(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "region")
    val t = fresh("br")
    s.sql(s"CREATE TABLE lakeq.db.$t USING lake AS SELECT r_regionkey, r_name FROM $v")
    s.sql(s"CALL lakeq.system.create_branch(table => 'db.$t', branch => 'audit')")
    s.sql(s"INSERT INTO lakeq.db.$t.branch_audit SELECT r_regionkey + 100, r_name FROM $v")
    val branchRows = s.sql(s"SELECT count(*) FROM lakeq.db.$t.branch_audit")
      .collect()(0).getLong(0)
    require(branchRows == 10, s"branch should see 10 rows, got $branchRows")
    s.sql(s"SELECT r_regionkey, r_name FROM lakeq.db.$t ORDER BY r_regionkey")
  }

  /** Add + rename columns; old files remain readable. */
  def lakeSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("se")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT r_regionkey, r_name FROM
             |(SELECT n_nationkey AS r_regionkey, n_name AS r_name FROM $v)""".stripMargin)
    s.sql(s"ALTER TABLE lakeq.db.$t ADD COLUMN extra bigint")
    s.sql(s"ALTER TABLE lakeq.db.$t RENAME COLUMN r_name TO region_name")
    s.sql(s"""INSERT INTO lakeq.db.$t
             |SELECT n_nationkey + 100, n_name, n_nationkey FROM $v
             |WHERE n_nationkey < 3""".stripMargin)
    s.sql(s"""SELECT r_regionkey, region_name, extra FROM lakeq.db.$t
             |ORDER BY r_regionkey""".stripMargin)
  }

  /** Dynamic partition overwrite replaces only the touched region. */
  def lakeDynamicOverwrite(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("dyn")
    s.sql(s"""CREATE TABLE lakeq.db.$t
             |(n_nationkey bigint, n_name string, n_regionkey bigint)
             |USING lake PARTITIONED BY (n_regionkey)""".stripMargin)
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name, n_regionkey FROM $v")
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try s.sql(s"""INSERT OVERWRITE lakeq.db.$t
                 |SELECT n_nationkey + 1000, n_name, n_regionkey FROM $v
                 |WHERE n_regionkey = 2""".stripMargin)
    finally prev match {
      case Some(p) => s.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    s.sql(s"""SELECT n_nationkey, n_name, n_regionkey FROM lakeq.db.$t
             |ORDER BY n_nationkey""".stripMargin)
  }

  /** Incremental read: only the second snapshot's rows. */
  def lakeIncrementalRead(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("inc")
    s.sql(s"CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_name string) USING lake")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v WHERE n_nationkey < 12")
    val v1 = s.sql(s"SELECT min(snapshot_id) FROM lakeq.db.$t.snapshots")
      .collect()(0).getLong(0)
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v WHERE n_nationkey >= 12")
    s.read.option("start-snapshot-id", v1.toString).table(s"lakeq.db.$t")
      .orderBy(col("n_nationkey"))
  }

  /** Compaction preserves content (bin-pack rewrite_data_files). */
  def lakeCompaction(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "supplier")
    val t = fresh("cmp")
    s.sql(s"CREATE TABLE lakeq.db.$t (s_suppkey bigint, s_name string) USING lake")
    (0 until 4).foreach(i =>
      s.sql(s"""INSERT INTO lakeq.db.$t SELECT s_suppkey, s_name FROM $v
               |WHERE s_suppkey % 4 = $i""".stripMargin))
    s.sql(s"""CALL lakeq.system.rewrite_data_files(table => 'db.$t',
             |options => map('min-input-files','1'))""".stripMargin)
    val nFiles = s.sql(s"SELECT count(*) FROM lakeq.db.$t.files")
      .collect()(0).getLong(0)
    require(nFiles < 4, s"compaction should shrink the file count, got $nFiles")
    s.sql(s"SELECT s_suppkey, s_name FROM lakeq.db.$t ORDER BY s_suppkey")
  }

  /** Top-N pushdown: ORDER BY + LIMIT over a multi-file lake table.
    * The four inserts commit disjoint key ranges, so the scan's
    * dominated-file cut (SupportsPushDownTopN, partial) plans only
    * the head range's file — the 100 TB "latest 50" shape. Values
    * are exact regardless (Spark keeps its own Sort+Limit on top);
    * LakeSuite proves the file cut, this gate proves the values. */
  def lakeTopn(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "orders")
    val t = fresh("topn")
    s.sql(s"CREATE TABLE lakeq.db.$t (o_orderkey bigint, o_totalprice double) USING lake")
    val maxKey = s.sql(s"SELECT max(o_orderkey) FROM $v").collect()(0).getLong(0)
    val step = math.max(1L, maxKey / 4 + 1)
    (0 until 4).foreach(i =>
      s.sql(s"""INSERT INTO lakeq.db.$t
               |SELECT o_orderkey, o_totalprice FROM $v
               |WHERE o_orderkey >= ${i * step}
               |  AND o_orderkey < ${(i + 1) * step}""".stripMargin))
    s.sql(s"""SELECT o_orderkey, o_totalprice FROM lakeq.db.$t
             |ORDER BY o_orderkey LIMIT 50""".stripMargin)
  }

  /** CDC changelog over append+delete snapshots. */
  def lakeChangelog(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("cdc")
    s.sql(s"CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_regionkey bigint) USING lake")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_regionkey FROM $v WHERE n_nationkey < 12")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_regionkey FROM $v WHERE n_nationkey >= 12")
    s.sql(s"DELETE FROM lakeq.db.$t WHERE n_regionkey = 0")
    val view = fresh("cdcview")
    s.sql(s"""CALL lakeq.system.create_changelog_view(table => 'db.$t',
             |changelog_view => '$view',
             |identifier_columns => array('n_nationkey'))""".stripMargin)
    s.sql(s"""SELECT _change_type, count(*) AS n, sum(n_nationkey) AS s
             |FROM $view GROUP BY _change_type ORDER BY _change_type""".stripMargin)
  }

  /** RTAS: CREATE OR REPLACE TABLE AS SELECT replaces every row in
    * one atomic commit with history retained. The gate checks BOTH
    * sides of the contract: the replaced state, and the changelog
    * ACROSS the RTAS boundary — its delete events count the replaced
    * rows (values ride the dead pre-RTAS lineage: RTAS assigns fresh
    * field ids) and its inserts count both eras. Before round 7's
    * op-name fix the RTAS commit masqueraded as the row-preserving
    * "replace" marker and the CDC layer dropped the whole-table
    * replacement on the floor. */
  def lakeRtas(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("rtas")
    s.sql(s"CREATE TABLE lakeq.db.$t USING lake AS " +
      s"SELECT n_nationkey, n_name FROM $v WHERE n_nationkey < 10")
    s.sql(s"CREATE OR REPLACE TABLE lakeq.db.$t USING lake AS " +
      s"SELECT n_nationkey, n_name FROM $v WHERE n_nationkey >= 10")
    val view = fresh("rtasview")
    s.sql(s"CALL lakeq.system.create_changelog_view(table => 'db.$t', " +
      s"changelog_view => '$view')")
    s.sql(s"""SELECT _change_type, count(*) AS n
             |FROM $view GROUP BY _change_type
             |UNION ALL
             |SELECT 'final', count(*) FROM lakeq.db.$t
             |ORDER BY _change_type""".stripMargin)
  }

  /** Raw CDC relation `tbl.changes`: merge-on-read deletes make the
    * diff position-exact, so the raw table is oracle-deterministic
    * (CoW carry-overs would depend on file layout). */
  def lakeChangesTable(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("chtbl")
    s.sql(s"""CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_regionkey bigint)
             |USING lake
             |TBLPROPERTIES ('write.delete.mode'='merge-on-read')""".stripMargin)
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_regionkey FROM $v")
    s.sql(s"DELETE FROM lakeq.db.$t WHERE n_regionkey = 0")
    s.sql(s"""SELECT _change_type, count(*) AS n, sum(n_nationkey) AS s
             |FROM lakeq.db.$t.changes
             |GROUP BY _change_type ORDER BY _change_type""".stripMargin)
  }

  /** Materialized view: exact-match rewrite serves the aggregate. */
  def lakeMvRollup(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "lineitem")
    val mv = fresh("mv")
    CreateMaterializedViewCommand(mv,
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         |count(*) AS cnt FROM $v
         |GROUP BY l_returnflag, l_linestatus""".stripMargin, ifNotExists = false)
      .run(s)
    s.sql(s"""SELECT l_returnflag, l_linestatus, round(sum_qty, 2) AS sum_qty, cnt
             |FROM ${MvCommands.backingName(mv)}
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** True incremental MV refresh (beyond reference): the MV is built
    * over half of orders, the other half appends, and REFRESH
    * INCREMENTAL must MERGE the delta (the gate hard-fails if the
    * refresher fell back to a full recompute) — the oracle aggregates
    * the whole table, so the merged backing must be exact. Mergeable
    * outputs only: SUM/COUNT over exact int64, MIN/MAX over double. */
  def lakeMvIncremental(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "orders")
    val t = fresh("mvi")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake AS
             |SELECT o_orderstatus, o_orderkey, o_totalprice FROM $v
             |WHERE o_orderkey % 2 = 0""".stripMargin)
    val mv = fresh("mv")
    CreateMaterializedViewCommand(mv,
      s"""SELECT o_orderstatus, sum(o_orderkey) AS key_sum,
         |count(*) AS cnt, min(o_totalprice) AS min_price,
         |max(o_totalprice) AS max_price
         |FROM lakeq.db.$t GROUP BY o_orderstatus""".stripMargin,
      ifNotExists = false).run(s)
    s.sql(s"""INSERT INTO lakeq.db.$t
             |SELECT o_orderstatus, o_orderkey, o_totalprice FROM $v
             |WHERE o_orderkey % 2 = 1""".stripMargin)
    RefreshMaterializedViewCommand(mv, incremental = true).run(s)
    require(MvCatalog.get(mv).exists(_.lastRefreshMode == "incremental"),
      "incremental MV refresh fell back to a full recompute")
    s.sql(s"""SELECT o_orderstatus, key_sum, cnt, min_price, max_price
             |FROM ${MvCommands.backingName(mv)}
             |ORDER BY o_orderstatus""".stripMargin)
  }

  /** Rows-only check: snapshot log introspection (not SQL-expressible
    * against the source tables — driver records a weaker check). */
  /** Metadata tables, reshaped to engine-deterministic scalars so
    * the driver can hash-check them (rows-only was the one gate the
    * oracle never verified). The op sequence is fixed — CTAS +
    * INSERT + CoW DELETE over the 5-row region table, identical at
    * every SF — so each count below is engine contract: per-op
    * snapshot counts, live file count, history/refs rows, and the
    * final row count. The oracle states the same expectations as
    * literals, the way the reference's own tests assert metadata
    * tables; a drift here IS an engine behavior change. */
  def lakeMetadata(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "region")
    val t = fresh("meta")
    s.sql(s"CREATE TABLE lakeq.db.$t USING lake AS SELECT r_regionkey FROM $v")
    s.sql(s"INSERT INTO lakeq.db.$t SELECT r_regionkey + 10 FROM $v")
    s.sql(s"DELETE FROM lakeq.db.$t WHERE r_regionkey = 1")
    s.sql(s"""SELECT concat('op_', operation) AS item, count(*) AS n
             |FROM lakeq.db.$t.snapshots GROUP BY operation
             |UNION ALL SELECT 'snapshots', count(*) FROM lakeq.db.$t.snapshots
             |UNION ALL SELECT 'history', count(*) FROM lakeq.db.$t.history
             |UNION ALL SELECT 'refs', count(*) FROM lakeq.db.$t.refs
             |UNION ALL SELECT 'files', count(*) FROM lakeq.db.$t.files
             |UNION ALL SELECT 'rows_final', count(*) FROM lakeq.db.$t
             |ORDER BY item""".stripMargin)
  }

  /** Merge-on-read DELETE: data files stay byte-identical, matching
    * rows are masked by position-delete files, and the subsequent read
    * exercises the mask-applying scan path (PosDeleteScan). */
  def lakeMorDelete(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "customer")
    val t = fresh("mor")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake
             |TBLPROPERTIES ('write.delete.mode'='merge-on-read') AS
             |SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM $v""".stripMargin)
    s.sql(s"DELETE FROM lakeq.db.$t WHERE c_mktsegment = 'BUILDING' AND c_acctbal < 0")
    s.sql(s"""SELECT c_custkey, c_name, c_mktsegment,
             |  round(c_acctbal, 2) AS bal
             |FROM lakeq.db.$t ORDER BY c_custkey""".stripMargin)
  }

  /** Merge-on-read UPDATE + MERGE (delta writes): parent data files
    * stay in place; matched rows are masked by position deletes and
    * re-inserted as new-file deltas (SupportsDelta WriteDelta plan),
    * then read back through the mask-applying scan. */
  def lakeMorUpsert(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "supplier")
    val t = fresh("morup")
    s.sql(s"""CREATE TABLE lakeq.db.$t USING lake
             |TBLPROPERTIES ('write.update.mode'='merge-on-read',
             |  'write.merge.mode'='merge-on-read') AS
             |SELECT s_suppkey, s_nationkey, s_acctbal FROM $v""".stripMargin)
    val before = s.sql(s"SELECT count(*) FROM lakeq.db.$t.files")
      .collect()(0).getLong(0)
    s.sql(s"UPDATE lakeq.db.$t SET s_acctbal = s_acctbal + 500 WHERE s_nationkey = 7")
    s.sql(s"""MERGE INTO lakeq.db.$t t USING
             |(SELECT s_suppkey FROM $v WHERE s_nationkey IN (3, 7)) src
             |ON t.s_suppkey = src.s_suppkey
             |WHEN MATCHED AND t.s_nationkey = 3 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET s_acctbal = t.s_acctbal + 1""".stripMargin)
    val kept = s.sql(s"SELECT count(*) FROM lakeq.db.$t.files")
      .collect()(0).getLong(0)
    require(kept >= before, s"delta DML must not rewrite parent files " +
      s"($before before, $kept after)")
    s.sql(s"""SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS bal
             |FROM lakeq.db.$t ORDER BY s_suppkey""".stripMargin)
  }

  /** Equality-delete upserts (Iceberg-v2 / Flink-sink semantics): the
    * second batch's keys replace the first's rows WITHOUT reading or
    * rewriting any existing file — the commit adds data files plus one
    * equality-delete file of the batch's keys, and the scan applies
    * them as an executor-side hash filter. Then compaction folds the
    * filter away; the result must be identical before and after. */
  def lakeUpsert(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("ups")
    s.sql(s"""CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_name string)
             | USING lake TBLPROPERTIES (
             |  'identifier-fields'='n_nationkey',
             |  'write.upsert.enabled'='true')""".stripMargin)
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v")
    s.sql(s"""INSERT INTO lakeq.db.$t
             |SELECT n_nationkey, lower(n_name) FROM $v
             |WHERE n_nationkey < 10""".stripMargin)
    val eqFiles = s.sql(
      s"SELECT count(*) FROM lakeq.db.$t.delete_files WHERE content = 2")
      .collect()(0).getLong(0)
    require(eqFiles == 1, s"expected one equality-delete file, got $eqFiles")
    val before = s.sql(s"SELECT n_nationkey, n_name FROM lakeq.db.$t").collect()
    // compaction folds the deletes back into plain data files
    s.sql(s"CALL lakeq.system.rewrite_data_files(table => 'lakeq.db.$t', " +
      "options => map('rewrite-all','true','min-input-files','1'))")
    val eqAfter = s.sql(
      s"SELECT count(*) FROM lakeq.db.$t.delete_files WHERE content = 2")
      .collect()(0).getLong(0)
    require(eqAfter == 0, s"compaction must retire equality deletes, got $eqAfter")
    val after = s.sql(s"SELECT n_nationkey, n_name FROM lakeq.db.$t").collect()
    require(before.map(_.toString).sorted.sameElements(after.map(_.toString).sorted),
      "compaction changed the upsert result")
    s.sql(s"SELECT n_nationkey, n_name FROM lakeq.db.$t ORDER BY n_nationkey")
  }

  /** Streaming CDC end to end: upsert commits consumed through the
    * `tbl.changes` STREAMING source (offsets = snapshot ids,
    * Trigger.AvailableNow drains the history in bounded micro-batches)
    * into a sink table; the collected event log — inserts plus the
    * upsert's replacement deletes — must reproduce the oracle exactly. */
  def lakeCdcStream(s: SparkSession, d: String): DataFrame = {
    cat(s)
    val v = srcView(s, d, "nation")
    val t = fresh("cdc")
    s.sql(s"""CREATE TABLE lakeq.db.$t (n_nationkey bigint, n_name string)
             | USING lake TBLPROPERTIES (
             |  'identifier-fields'='n_nationkey',
             |  'write.upsert.enabled'='true')""".stripMargin)
    s.sql(s"INSERT INTO lakeq.db.$t SELECT n_nationkey, n_name FROM $v")
    s.sql(s"""INSERT INTO lakeq.db.$t
             |SELECT n_nationkey, lower(n_name) FROM $v
             |WHERE n_nationkey < 10""".stripMargin)
    val sink = fresh("cdcsink")
    val ck = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    val q = s.readStream
      .option("streaming-max-snapshots-per-micro-batch", "1")
      .table(s"lakeq.db.$t.changes")
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a timed-out drain must FAIL the gate, not serve a half-filled
    // sink as the "result" (and must not leave the query writing to
    // the sink while the harness serializes it)
    val drained = q.awaitTermination(120000)
    if (!drained) q.stop()
    require(drained, "CDC drain did not finish within 120s")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    s.sql(s"""SELECT n_nationkey, n_name, _change_type FROM $sink
             |ORDER BY n_nationkey, _change_type, n_name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_ctas" -> (lakeCtas _),
    "lake_upsert" -> (lakeUpsert _),
    "lake_cdc_stream" -> (lakeCdcStream _),
    "lake_insert" -> (lakeInsert _),
    "lake_delete" -> (lakeDelete _),
    "lake_mor_delete" -> (lakeMorDelete _),
    "lake_mor_upsert" -> (lakeMorUpsert _),
    "lake_update" -> (lakeUpdate _),
    "lake_merge" -> (lakeMerge _),
    "lake_time_travel" -> (lakeTimeTravel _),
    "lake_branch_isolation" -> (lakeBranchIsolation _),
    "lake_schema_evolution" -> (lakeSchemaEvolution _),
    "lake_dynamic_overwrite" -> (lakeDynamicOverwrite _),
    "lake_incremental_read" -> (lakeIncrementalRead _),
    "lake_compaction" -> (lakeCompaction _),
    "lake_topn" -> (lakeTopn _),
    "lake_changelog" -> (lakeChangelog _),
    "lake_changes_table" -> (lakeChangesTable _),
    "lake_rtas" -> (lakeRtas _),
    "lake_mv_rollup" -> (lakeMvRollup _),
    "lake_mv_incremental" -> (lakeMvIncremental _),
    "lake_metadata" -> (lakeMetadata _),
  )

  val oracles: Map[String, String] = Map(
    "lake_ctas" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "lake_rtas" ->
      """SELECT * FROM (
        |  SELECT 'delete' AS _change_type, count(*)::BIGINT AS n
        |  FROM nation WHERE n_nationkey < 10
        |  UNION ALL
        |  SELECT 'insert', count(*)::BIGINT FROM nation
        |  UNION ALL
        |  SELECT 'final', count(*)::BIGINT FROM nation
        |  WHERE n_nationkey >= 10)
        |ORDER BY _change_type""".stripMargin,
    "lake_upsert" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 10 THEN lower(n_name) ELSE n_name END
        |    AS n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "lake_cdc_stream" ->
      """SELECT * FROM (
        |  SELECT n_nationkey, n_name, 'insert' AS _change_type FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, lower(n_name), 'insert' FROM nation
        |  WHERE n_nationkey < 10
        |  UNION ALL
        |  SELECT n_nationkey, n_name, 'delete' FROM nation
        |  WHERE n_nationkey < 10
        |) ORDER BY n_nationkey, _change_type, n_name""".stripMargin,
    "lake_insert" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "lake_delete" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment <> 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "lake_mor_delete" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  round(c_acctbal, 2) AS bal
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,
    "lake_mor_upsert" ->
      """SELECT s_suppkey, s_nationkey,
        |  round(CASE WHEN s_nationkey = 7 THEN s_acctbal + 501
        |             ELSE s_acctbal END, 2) AS bal
        |FROM supplier
        |WHERE s_nationkey <> 3
        |ORDER BY s_suppkey""".stripMargin,
    "lake_update" ->
      """SELECT s_suppkey, s_nationkey,
        |  round(CASE WHEN s_nationkey = 5 THEN s_acctbal + 1000
        |             ELSE s_acctbal END, 2) AS bal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "lake_merge" ->
      """SELECT c_custkey, c_name,
        |  round(CASE WHEN c_custkey >= 51 THEN c_acctbal + 1000
        |             ELSE c_acctbal END, 2) AS bal
        |FROM customer
        |WHERE c_custkey BETWEEN 11 AND 150
        |ORDER BY c_custkey""".stripMargin,
    "lake_time_travel" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    // literal expectations, the way the reference's own tests assert
    // metadata tables: the gate's op sequence is fixed over the 5-row
    // region table (constant at every SF), so these counts are engine
    // contract — snapshots {CTAS, INSERT}=append ×2 + CoW DELETE ×1,
    // 2 live files (the delete rewrote the CTAS file in place),
    // 1 ref (main), 10 - 1 = 9 surviving rows
    "lake_metadata" ->
      """SELECT * FROM (VALUES
        |  ('files', 2::BIGINT), ('history', 3::BIGINT),
        |  ('op_append', 2::BIGINT), ('op_delete', 1::BIGINT),
        |  ('refs', 1::BIGINT), ('rows_final', 9::BIGINT),
        |  ('snapshots', 3::BIGINT)) AS v(item, n)
        |ORDER BY item""".stripMargin,
    "lake_branch_isolation" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "lake_schema_evolution" ->
      """SELECT n_nationkey AS r_regionkey, n_name AS region_name,
        |  CAST(NULL AS BIGINT) AS extra FROM nation
        |UNION ALL
        |SELECT n_nationkey + 100, n_name, n_nationkey FROM nation
        |WHERE n_nationkey < 3
        |ORDER BY r_regionkey""".stripMargin,
    "lake_dynamic_overwrite" ->
      """SELECT CASE WHEN n_regionkey = 2 THEN n_nationkey + 1000
        |            ELSE n_nationkey END AS n_nationkey,
        |       n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "lake_incremental_read" ->
      """SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 12
        |ORDER BY n_nationkey""".stripMargin,
    "lake_compaction" ->
      "SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey",
    "lake_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50""".stripMargin,
    "lake_changelog" ->
      """SELECT 'delete' AS _change_type, count(*) AS n,
        |  sum(n_nationkey)::BIGINT AS s
        |FROM nation WHERE n_regionkey = 0
        |UNION ALL
        |SELECT 'insert', count(*), sum(n_nationkey)::BIGINT FROM nation
        |ORDER BY _change_type""".stripMargin,
    "lake_changes_table" ->
      """SELECT 'delete' AS _change_type, count(*) AS n,
        |  sum(n_nationkey)::BIGINT AS s
        |FROM nation WHERE n_regionkey = 0
        |UNION ALL
        |SELECT 'insert', count(*), sum(n_nationkey)::BIGINT FROM nation
        |ORDER BY _change_type""".stripMargin,
    "lake_mv_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "lake_mv_incremental" ->
      """SELECT o_orderstatus, sum(o_orderkey)::BIGINT AS key_sum,
        |  count(*) AS cnt, min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // lake_metadata intentionally has no oracle (rows-only check)
  )
}
