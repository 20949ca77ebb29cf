package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media record. */
case class MediaFeature(doc_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, checksum: String)

/** A sampled frame with its feature vector. */
case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
    f0: Double, f1: Double)

/** Swappable decode backend for the multimodal operators. The Spark
  * plumbing (schema, typed Datasets, per-partition batching,
  * partition-preserving execution) is codec-agnostic: a real
  * deployment drops in an implementation backed by actual image/audio
  * libraries without touching the operators. Implementations must be
  * Serializable — the instance ships in the task closure; heavy
  * native state (codec contexts, model weights) belongs in [[open]],
  * which runs once per partition on the executor, not per row.
  */
trait MediaCodec extends Serializable {
  /** Per-partition initialization (load native codec / model once per
    * task, amortized over the whole batch). */
  def open(): Unit = ()

  /** Decode one payload to its media metadata/features. */
  def decode(docId: Long, kind: String, payload: Array[Byte]): MediaFeature

  /** Sample frames/windows from one payload (video → frames, audio →
    * windows): the 1→N transform shape. */
  def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[Frame]
}

/** Deterministic STUB codec — this container ships no image/audio
  * libraries, so the default backend fakes the decode with
  * content-derived values (CRC32), keeping tests and the driver's
  * rows-only check stable. Every other part of the pipeline is real.
  */
object StubCodec extends MediaCodec {

  override def decode(docId: Long, kind: String, payload: Array[Byte]): MediaFeature = {
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    val c = crc.getValue
    // fake "dimensions" derived from content, as a real decoder would
    MediaFeature(docId, kind, payload.length,
      width = (c % 640).toInt + 1,
      height = ((c >> 16) % 480).toInt + 1,
      checksum = java.lang.Long.toHexString(c))
  }

  override def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[Frame] = {
    val nFrames = math.min(4, payload.length / 256 + 1)
    (0 until nFrames).iterator.map { i =>
      val from = i * payload.length / nFrames
      val until = (i + 1) * payload.length / nFrames
      val crc = new java.util.zip.CRC32
      crc.update(payload, from, until - from)
      val c = crc.getValue
      // stub feature extraction: two deterministic pseudo-features
      Frame(docId, i, until - from,
        (c % 1000L).toDouble / 1000.0, ((c >> 20) % 1000L).toDouble / 1000.0)
    }
  }
}

/** Multimodal column plumbing (SURVEY §2 rows 36/48).
  *
  * Media is modeled as an opaque `binary` payload column plus typed
  * metadata — the layout a 100 TB image/audio corpus would use in
  * parquet (payload column stays unread unless selected; metadata
  * predicates prune row groups). Decoding goes through the swappable
  * [[MediaCodec]] interface; the default [[StubCodec]] is a documented
  * sandbox stand-in.
  */
object Multimodal {

  /** m1: build a binary media column from the documents table, then
    * run the batched per-partition decode → typed feature rows. */
  def m1MultimodalMeta(s: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
    bin.mapPartitions { it =>
      codec.open() // once per task, amortized over the whole batch
      it.map { case (id, kind, payload) => codec.decode(id, kind, payload) }
    }.toDF().orderBy("doc_id")
  }

  /** m2: frame sampling — the 1→N batched transform shape (video →
    * frames, audio → windows). Per-partition iterator semantics keep
    * memory at one batch regardless of corpus size, and the output
    * partitioning inherits the input's (no shuffle until the
    * downstream aggregate). */
  def m2FrameSample(s: SparkSession, dir: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    import s.implicits._
    val bin = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      codec.open()
      it.flatMap { case (id, payload) => codec.sampleFrames(id, payload) }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  val oracles: Map[String, String] = Map.empty // rows-only: binary plumbing

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> ((s: SparkSession, d: String) => m1MultimodalMeta(s, d)),
    "m2_frame_sample" -> ((s: SparkSession, d: String) => m2FrameSample(s, d)))
}
