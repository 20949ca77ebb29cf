package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DRIFT-TRIGGERED refresh policy for the durable model registries
  * (the qc quality classifier and the BPE tokenizer — the two trained
  * artifacts the engine publishes through AtomicPublish). The
  * build-once registries are corpus-fingerprinted, so before this an
  * ingest batch forced retrain-by-fingerprint: every arriving batch
  * paid the full training loop whether or not the model had anything
  * to learn. The monitoring plane already computes the trigger inputs
  * (psi1's PSI bands, qc2's ECE); this module turns them into the
  * lifecycle rule every model registry runs in production:
  *
  *   - NO trigger (drift PSI ≤ [[RetrainPsi]]) → VERSION REUSE: the
  *     committed model keeps serving, nothing is published;
  *   - trigger → a NEW VERSION is trained and published atomically,
  *     with the drift evidence (batch id, PSI, refreshed flag) riding
  *     the same pointer swap in the `meta` output, so pipe4's
  *     monitoring report reads the refresh state from the committed
  *     snapshot alone.
  *
  * The PSI itself is computed per model plane (score-distribution PSI
  * for the classifier, character-distribution PSI for the tokenizer)
  * against reference bands the registry stored AT TRAINING TIME —
  * drift is always measured model-vs-its-own-training-view, never
  * against whatever the corpus happens to look like today.
  */
object ModelRegistry {

  /** psi1's banking rule of thumb, shared with pipe4's banding:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 retrain. */
  val DriftingPsi = 0.1
  val RetrainPsi = 0.25

  /** Laplace-smoothed PSI between two count distributions over the
    * union support — the driver-side fold both model planes reduce
    * to (their inputs are bounded: ≤10 score buckets / the character
    * vocabulary). */
  def psiOf[K](base: Map[K, Long], cur: Map[K, Long]): Double = {
    val keys = base.keySet ++ cur.keySet
    val k = keys.size.toDouble
    val tb = base.values.sum.toDouble
    val tc = cur.values.sum.toDouble
    keys.iterator.map { key =>
      val pb = (base.getOrElse(key, 0L) + 1.0) / (tb + k)
      val pc = (cur.getOrElse(key, 0L) + 1.0) / (tc + k)
      (pc - pb) * math.log(pc / pb)
    }.sum
  }

  /** The meta output every refreshed (or freshly built) model version
    * carries: which batch was judged, the drift PSI it showed, and
    * whether this version is a retrain. */
  def metaOutput(s: SparkSession, batchId: Long, psi: Double,
      refreshed: Boolean): (String, DataFrame) = {
    import s.implicits._
    "meta" -> Seq((batchId, psi, refreshed))
      .toDF("batch_id", "drift_psi", "refreshed")
  }

  /** The policy: reuse below the threshold, publish `retrain`'s
    * outputs (plus the meta evidence) above it. Returns the serving
    * version and whether a refresh happened. */
  def refreshIfDrifted(s: SparkSession, root: String, batchId: Long,
      psi: Double, threshold: Double = RetrainPsi)(
      retrain: => Seq[(String, DataFrame)]): (String, Boolean) =
    if (psi > threshold)
      (AtomicPublish.publish(s, root,
        retrain :+ metaOutput(s, batchId, psi, refreshed = true)), true)
    else
      (AtomicPublish.currentVersion(s, root).getOrElse("v0"), false)

  /** One pipe4 report row from a registry's committed meta: the
    * refresh state as monitoring output (check, metric, drift PSI,
    * status ∈ retrained/drifting/stable). */
  def reportRow(s: SparkSession, root: String, check: String): DataFrame =
    AtomicPublish.readOutput(s, root, "meta")
      .select(lit(check).as("check"), lit("drift_psi").as("metric"),
        round(col("drift_psi"), 6).as("value"),
        when(col("refreshed"), "retrained")
          .when(col("drift_psi") > DriftingPsi, "drifting")
          .otherwise("stable").as("status"))
}
