package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 row 36).
  *
  * Media is modeled as an opaque `binary` payload column plus typed
  * metadata — the layout a 100 TB image/audio corpus would use in
  * parquet (payload column stays unread unless selected; metadata
  * predicates prune row groups). The decode step is STUBBED with a
  * deterministic fake (this container ships no image/audio codecs);
  * the Spark-side plumbing — schema, typed Dataset, per-partition
  * batched transform, partition-preserving execution — is real.
  */
object Multimodal {

  /** A decoded media record. */
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, checksum: String)

  /** STUB decoder: stands in for an image decode + resize + feature
    * extraction. Deterministic in the payload bytes so tests and the
    * driver's rows-only check are stable. A real deployment would
    * decode here (per-partition, so codec init happens once per task,
    * not once per row). */
  private def stubDecode(docId: Long, kind: String, payload: Array[Byte]): MediaFeature = {
    val n = payload.length
    // fake "dimensions" derived from content, as a real decoder would
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    val c = crc.getValue
    MediaFeature(docId, kind, n,
      width = (c % 640).toInt + 1,
      height = ((c >> 16) % 480).toInt + 1,
      checksum = java.lang.Long.toHexString(c))
  }

  /** m1: build a binary media column from the documents table, then
    * run the batched per-partition decode → typed feature rows. */
  def m1MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
    bin.mapPartitions { it =>
      // per-partition setup (codec/model init) would go here — once
      // per task, amortized over the whole batch
      it.map { case (id, kind, payload) => stubDecode(id, kind, payload) }
    }.toDF().orderBy("doc_id")
  }

  /** A sampled frame with its (stubbed) feature vector. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
      f0: Double, f1: Double)

  /** m2: frame sampling — the 1→N batched transform shape (video →
    * frames, audio → windows). Each payload yields up to 4 frames,
    * each with a stubbed fixed-width feature vector; per-partition
    * iterator semantics keep memory at one batch regardless of corpus
    * size, and the output partitioning inherits the input's (no
    * shuffle until the downstream aggregate). */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val nFrames = math.min(4, payload.length / 256 + 1)
        (0 until nFrames).iterator.map { i =>
          val from = i * payload.length / nFrames
          val until = (i + 1) * payload.length / nFrames
          val crc = new java.util.zip.CRC32
          crc.update(payload, from, until - from)
          val c = crc.getValue
          // stub feature extraction: two deterministic pseudo-features
          Frame(id, i, until - from,
            (c % 1000L).toDouble / 1000.0, ((c >> 20) % 1000L).toDouble / 1000.0)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  val oracles: Map[String, String] = Map.empty // rows-only: binary plumbing

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> (m1MultimodalMeta _),
    "m2_frame_sample" -> (m2FrameSample _))
}
