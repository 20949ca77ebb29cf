package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-schema migration protocol — the reference's
  * `runMigrations` ledger (db.mjs:440-505: `PRAGMA user_version`
  * check, per-migration BEGIN/COMMIT, skip-if-applied) re-expressed
  * for a parquet warehouse.
  *
  * SQLite tracks the applied version in a pragma and wraps each
  * migration in a transaction; the warehouse equivalent is an
  * INSERT-only `schema_versions` ledger table published ATOMICALLY
  * with the migrated data: every migration stages `{data,
  * schema_versions}` as one [[AtomicPublish]] version and flips the
  * pointer once, so a crash mid-migration leaves the previous
  * consistent prefix (ledger and data can never disagree — they
  * commit in the same rename). Re-running the migrator compares the
  * code's migration list against the committed ledger and applies
  * only the suffix; a full re-run is a no-op that never rewrites
  * data (MigrationsSpec pins this).
  *
  * Each ledger row carries deterministic audit stats (row count, key
  * checksum) of the data as-of that version — at 100 TB the count+sum
  * is one aggregate over output you are already writing, and it is
  * what makes "did migration N really run?" answerable from the
  * ledger alone. No wall-clock columns: the ledger must hash-match
  * the SQL oracle.
  */
object Migrations {

  final case class Migration(version: Int, description: String,
      transform: DataFrame => DataFrame)

  /** The engine's migration list for the events table: ingest, then a
    * derived-column addition, then a constraint tightening — the three
    * shapes (create, widen, enforce) db.mjs:446-461 walks through. */
  def eventMigrations: Seq[Migration] = Seq(
    Migration(1, "ingest raw events",
      df => df.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))),
    Migration(2, "add event day column",
      df => df.withColumn("day", to_date(col("ts")))),
    Migration(3, "enforce user_id not null",
      df => df.filter(col("user_id").isNotNull))
  )

  private val Data = "data"
  private val Ledger = "schema_versions"

  /** Highest migration version recorded in the committed ledger, or 0
    * if nothing was ever published. */
  def appliedVersion(s: SparkSession, root: String): Int =
    AtomicPublish.currentVersion(s, root) match {
      case None => 0
      case Some(_) =>
        AtomicPublish.readOutput(s, root, Ledger)
          .agg(max(col("version"))).head().getInt(0)
    }

  /** Apply every migration past the committed version, one atomic
    * publish per migration (data + ledger commit together). Returns
    * the versions applied by THIS call — empty means the ledger was
    * already current (idempotent re-run). */
  def migrate(s: SparkSession, root: String, source: DataFrame,
      migrations: Seq[Migration] = eventMigrations): Seq[Int] = {
    val current = appliedVersion(s, root)
    val pending = migrations.filter(_.version > current).sortBy(_.version)
    if (pending.isEmpty) return Nil
    var data =
      if (current == 0) source
      else AtomicPublish.readOutput(s, root, Data)
    var ledger =
      if (current == 0)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "version INT, description STRING, n_rows BIGINT, sum_user BIGINT"))
      else AtomicPublish.readOutput(s, root, Ledger)
    pending.foreach { m =>
      data = m.transform(data).localCheckpoint()
      val Array(n, su) = data
        .agg(count(lit(1)), sum(col("user_id")).cast("long"))
        .head().toSeq.toArray
      val row = s.range(1).select(lit(m.version).as("version"),
        lit(m.description).as("description"),
        lit(n.asInstanceOf[Long]).as("n_rows"),
        lit(su.asInstanceOf[Long]).as("sum_user"))
      ledger = ledger.unionByName(row).localCheckpoint()
      AtomicPublish.publish(s, root, Seq(Data -> data, Ledger -> ledger))
      // re-read through the commit so the next transform (and the
      // next publish's staging write) consumes the durable copy, not
      // a lineage chained across versions
      data = AtomicPublish.readOutput(s, root, Data)
      ledger = AtomicPublish.readOutput(s, root, Ledger)
    }
    pending.map(_.version)
  }

  /** sc2: run the migrator (a no-op when already current) and read the
    * committed ledger back — version, description, and the per-version
    * audit stats the oracle recomputes from the raw table. */
  def sc2MigrationLedger(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${graft.TmpRoots.perProcess("graft_sources")}/sc2_migrations/$safe"
    migrate(s, root, Tables.events(s, dir))
    AtomicPublish.readOutput(s, root, Ledger).orderBy("version")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sc2_migration_ledger" -> (sc2MigrationLedger _))

  val oracles: Map[String, String] = Map(
    "sc2_migration_ledger" ->
      """WITH base AS (SELECT COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS su
        |  FROM events),
        |filt AS (SELECT COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS su
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT 1 AS version, 'ingest raw events' AS description,
        |  n AS n_rows, su AS sum_user FROM base
        |UNION ALL SELECT 2, 'add event day column', n, su FROM base
        |UNION ALL SELECT 3, 'enforce user_id not null', n, su FROM filt
        |ORDER BY version""".stripMargin)
}
