package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (SURVEY §2 row 165): blocked fuzzy matching over
  * the part-name catalog — the "same real-world thing, different
  * string" problem (catalog dedup, vendor-name conciliation) that
  * exact dedup (d1/r6) cannot see and full-corpus pairwise comparison
  * cannot afford.
  *
  * Scale shape (the Fellegi-Sunter blocking discipline): matching runs
  * on the DISTINCT-name table, never the row table — the name catalog
  * is vocabulary-bounded (t16's DF-table argument), and the quadratic
  * candidate step is confined to blocks (shared head token) the way
  * d2 confines Jaccard to shared shingles. The edit-distance kernel is
  * Spark's built-in codegen'd `levenshtein`, and a length-difference
  * bound rides the join condition so candidates that cannot pass the
  * threshold are dropped before the kernel runs.
  */
object EntityResolution {

  val MaxEditDistance = 2

  /** The distinct-name catalog with row support: one row per name,
    * carrying how many part rows share it and the canonical (min)
    * part key. Vocabulary-bounded — this is the frame ER runs on. */
  private[graft] def nameCatalog(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("canon_key"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))

  /** er1: blocked fuzzy name matching — candidate pairs share a block
    * (last name token), survive a length-difference prune, and match
    * iff levenshtein ≤ [[MaxEditDistance]]. Output is the match-pair
    * ledger an ER pipeline feeds to clustering (d6's connected
    * components slot in directly on (name_a, name_b) edges). */
  def er1FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val names = nameCatalog(s, dir)
    val a = names.select(col("p_name").as("name_a"), col("block"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("p_name").as("name_b"), col("block"),
      col("n_parts").as("n_parts_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <=
        MaxEditDistance)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= MaxEditDistance)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** er2: entity clustering — er1's match pairs closed into entity
    * groups by connected components (the full ER pipeline: block →
    * score → cluster). Edges are (canonical key, canonical key) pairs
    * at name grain, so the CC input is vocabulary-bounded; the
    * components run on [[Dedup]]'s large-star/small-star machinery
    * (O(log diameter) rounds, lineage-truncated). Every name gets a
    * row: its cluster key (component-min canonical part key —
    * singletons label themselves) and the cluster's name count, the
    * canonical-entity mapping a downstream join normalizes against. */
  /** Durable ER cluster index: the (canon_key, label) component map
    * from er1's match edges, built ONCE per part-catalog fingerprint
    * and published through AtomicPublish — the d6→d10 cluster-index
    * pattern applied to entities. Match edges + connected components
    * are a resolve-time artifact: every downstream normalization (er2
    * here; at 100 TB any join against canonical entities) reads the
    * committed map instead of re-running block-join + levenshtein +
    * O(log d) CC rounds per query. */
  private[graft] def erClusterRoot(dir: String): String = {
    val base = sys.props.getOrElse("graft.ercluster.base",
      s"${graft.GraftSession.defaultStateDir}/er_cluster_index")
    graft.sources.DurableIndex.root(base, dir,
      graft.sources.DurableIndex.fingerprint(s"$dir/part.parquet",
        s"ercluster-v1;block=lasttoken;maxdist=$MaxEditDistance"))
  }

  private[graft] def ensureErClusterIndex(s: SparkSession, dir: String): String =
    graft.sources.DurableIndex.ensure(s, erClusterRoot(dir)) {
      val names = nameCatalog(s, dir)
      val a = names.select(col("p_name").as("name_a"), col("block"),
        col("canon_key").as("canon_a"))
      val b = names.select(col("p_name").as("name_b"), col("block"),
        col("canon_key").as("canon_b"))
      val edges = a.join(b, Seq("block"))
        .filter(col("name_a") < col("name_b"))
        .filter(abs(length(col("name_a")) - length(col("name_b"))) <=
          MaxEditDistance)
        .filter(levenshtein(col("name_a"), col("name_b")) <= MaxEditDistance)
        .select(col("canon_a"), col("canon_b"))
      graft.sources.AtomicPublish.publish(s, erClusterRoot(dir),
        Seq("clusters" -> Dedup.connectedComponents(edges)
          .select(col("id").as("canon_key"), col("label"))))
    }

  def er2EntityClusters(s: SparkSession, dir: String): DataFrame = {
    val names = nameCatalog(s, dir)
    val cc = graft.sources.AtomicPublish.readOutput(s,
      ensureErClusterIndex(s, dir), "clusters")
    val labeled = names.join(cc, Seq("canon_key"), "left")
      .select(col("p_name"), col("n_parts"),
        coalesce(col("label"), col("canon_key")).as("cluster_key"))
    labeled
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_key"))))
      .select(col("p_name"), col("cluster_key"), col("cluster_size"),
        col("n_parts"))
      .orderBy(col("cluster_key"), col("p_name"))
  }

  /** er3: blocking-quality evaluation — the two numbers that decide
    * whether er1's head-token blocking is SOUND before anyone trusts
    * er2's clusters (Christen's blocking-evaluation framework, TKDE
    * 2012): pair completeness (what fraction of TRUE matches share a
    * block — blocking recall) and reduction ratio (what fraction of
    * all comparisons blocking avoids). n13's "evaluate your index
    * in-engine" discipline applied to ER. Ground truth needs pairs
    * BEYOND the blocks, so it joins the catalog on a LENGTH-BAND key —
    * complete for edit distance ≤ [[MaxEditDistance]] because
    * |len(a)−len(b)| ≤ lev(a,b), so no true match can escape the band:
    * the truth set is EXACT, never all-pairs. Metric definition note:
    * `n_candidates` counts same-block pairs INSIDE that length band,
    * so `reduction_ratio` measures the block + length-prune
    * combination — the comparisons er1's matcher actually runs (its
    * kernel-invocation count) — which reads HIGHER than Christen's
    * textbook RR over all same-block pairs. Deliberate: the band is
    * part of this engine's candidate generation, so the metric scores
    * the deployed pipeline, not the blocking key in isolation. Affordable for the same
    * reason er1 is: the distinct-name catalog is vocabulary-bounded
    * (at 100 TB a catalog too large for length-band truth gets the
    * dc1 treatment — evaluate on a deterministic key sample — but
    * that cap must never silently ship inside the metric). Every
    * output derives from exact integer counts ⇒ fully
    * hash-checkable. */
  def er3BlockingEval(s: SparkSession, dir: String): DataFrame = {
    val names = nameCatalog(s, dir)
    val a = names.select(col("p_name").as("name_a"),
      col("block").as("block_a"), length(col("p_name")).as("la"))
    val b = names.select(col("p_name").as("name_b"),
      col("block").as("block_b"), length(col("p_name")).as("lb"))
    // each unordered pair within the ±MaxEditDistance length band
    // matches on exactly one key (A emits its 2d+1-key band, B its
    // own length), then name_a < name_b keeps one orientation
    val pairs = a
      .select(col("name_a"), col("block_a"), col("la"),
        explode(sequence(col("la") - MaxEditDistance,
          col("la") + MaxEditDistance)).as("lk"))
      .join(b, col("lk") === col("lb") && col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        (col("block_a") === col("block_b")).as("in_block"),
        (levenshtein(col("name_a"), col("name_b")) <= MaxEditDistance)
          .as("is_true"))
    val tot = names.agg(count(lit(1)).as("n_names"))
    pairs
      .agg(sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("in_block"), 1L).otherwise(0L)).as("n_candidates"),
        sum(when(col("is_true") && col("in_block"), 1L).otherwise(0L))
          .as("n_true_in_block"))
      .crossJoin(broadcast(tot)) // 1-row bounded metadata
      .select(col("n_names"), col("n_true"), col("n_candidates"),
        col("n_true_in_block"),
        when(col("n_true") > 0, round(col("n_true_in_block").cast("double") /
          col("n_true"), 6)).as("pair_completeness"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          (col("n_names").cast("double") * (col("n_names") - 1) / 2), 6)
          .as("reduction_ratio"))
  }

  val oracles: Map[String, String] = Map(
    "er3_blocking_eval" ->
      s"""WITH names AS (SELECT p_name, min(p_partkey) AS canon,
         |    split_part(p_name, ' ', -1) AS block
         |  FROM part GROUP BY 1, 3),
         |s AS (SELECT * FROM names),
         |p AS (SELECT a.block = b.block AS in_block,
         |    levenshtein(a.p_name, b.p_name) <= $MaxEditDistance AS is_true
         |  FROM s a JOIN s b ON a.p_name < b.p_name
         |    AND abs(length(a.p_name) - length(b.p_name)) <= $MaxEditDistance),
         |t AS (SELECT count(*) AS n_names FROM s)
         |SELECT t.n_names,
         |  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN in_block THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_candidates,
         |  CAST(SUM(CASE WHEN is_true AND in_block THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_true_in_block,
         |  CASE WHEN SUM(CASE WHEN is_true THEN 1 ELSE 0 END) > 0
         |    THEN round(CAST(SUM(CASE WHEN is_true AND in_block THEN 1
         |      ELSE 0 END) AS DOUBLE)
         |      / SUM(CASE WHEN is_true THEN 1 ELSE 0 END), 6) END
         |    AS pair_completeness,
         |  round(1.0 - CAST(SUM(CASE WHEN in_block THEN 1 ELSE 0 END)
         |      AS DOUBLE)
         |    / (CAST(t.n_names AS DOUBLE) * (t.n_names - 1) / 2), 6)
         |    AS reduction_ratio
         |FROM p CROSS JOIN t GROUP BY t.n_names""".stripMargin,
    "er2_entity_clusters" ->
      s"""WITH RECURSIVE names AS (SELECT p_name, count(*) AS n_parts,
         |    min(p_partkey) AS canon,
         |    split_part(p_name, ' ', -1) AS block
         |  FROM part GROUP BY 1, 4),
         |pairs AS (SELECT a.canon AS ca, b.canon AS cb
         |  FROM names a JOIN names b ON a.block = b.block
         |    AND a.p_name < b.p_name
         |    AND abs(length(a.p_name) - length(b.p_name)) <= $MaxEditDistance
         |  WHERE levenshtein(a.p_name, b.p_name) <= $MaxEditDistance),
         |e AS (SELECT ca AS a, cb AS b FROM pairs
         |  UNION SELECT cb, ca FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM e) t
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
         |roots AS (SELECT a AS canon, MIN(b) AS cluster_key
         |  FROM reach GROUP BY a),
         |labeled AS (SELECT n.p_name, n.n_parts,
         |    COALESCE(r.cluster_key, n.canon) AS cluster_key
         |  FROM names n LEFT JOIN roots r ON r.canon = n.canon)
         |SELECT p_name, cluster_key,
         |  COUNT(*) OVER (PARTITION BY cluster_key) AS cluster_size,
         |  n_parts
         |FROM labeled ORDER BY cluster_key, p_name""".stripMargin,
    "er1_fuzzy_match" ->
      s"""WITH names AS (SELECT p_name, count(*) AS n_parts,
         |    split_part(p_name, ' ', -1) AS block
         |  FROM part GROUP BY 1, 3)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |  levenshtein(a.p_name, b.p_name) AS dist,
         |  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
         |FROM names a JOIN names b ON a.block = b.block
         |  AND a.p_name < b.p_name
         |  AND abs(length(a.p_name) - length(b.p_name)) <= $MaxEditDistance
         |WHERE levenshtein(a.p_name, b.p_name) <= $MaxEditDistance
         |ORDER BY 1, 2""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er1_fuzzy_match" -> (er1FuzzyMatch _),
    "er2_entity_clusters" -> (er2EntityClusters _),
    "er3_blocking_eval" -> (er3BlockingEval _))
}
