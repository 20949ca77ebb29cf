package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup-family checks (rows 24-28). d3/d4 have no SQL oracle — the
  * assertions here ARE their correctness contract: LSH candidates
  * must cover the high-similarity pairs found exactly, signatures
  * must be deterministic.
  */
class DedupSpec extends GraftSpec {

  test("d1 keeps one representative per distinct content") {
    val docs = Tables.documents(spark, sf).count()
    val d1 = Dedup.d1DedupExact(spark, sf)
    assert(d1.agg(sum("n_copies")).collect().head.getLong(0) == docs)
    assert(d1.select("content_hash").distinct().count() == d1.count())
  }

  test("d3 minhash-LSH recovers all exact-Jaccard >= 0.8 pairs") {
    val exact = Dedup.d2NgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d3MinhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed true near-dups: $missed")
  }

  test("d3 estimated jaccard within 0.35 of exact on shared pairs") {
    val exact = Dedup.d2NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = Dedup.d3MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = exact.keySet intersect est.keySet
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(exact(k) - est(k)) <= 0.35,
        s"pair $k exact=${exact(k)} est=${est(k)}")
    }
  }

  test("d4 simhash signature is deterministic and near-dups have small hamming") {
    val a = Dedup.d4Simhash(spark, sf).collect()
    val b = Dedup.d4Simhash(spark, sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    a.foreach(r => assert(r.getAs[Int]("hamming") <= 12))
  }

  test("d4 finds the exact duplicate pairs (hamming 0)") {
    // exact content dups (d1 n_copies > 1) must appear with hamming 0
    val dupGroups = Dedup.d1DedupExact(spark, sf)
      .filter(col("n_copies") > 1).count()
    if (dupGroups > 0) {
      val zero = Dedup.d4Simhash(spark, sf)
        .filter(col("hamming") === 0).count()
      assert(zero > 0)
    }
  }

  test("d6 clusters: both ends of every near-dup pair share a cluster, id = min member") {
    val pairs = Dedup.d2NgramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cluster = Dedup.d6DedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid is not its min member")
    }
  }

  test("DF cap keeps candidate counts linear when a hot shingle is injected") {
    import spark.implicits._
    val n = 3 * Dedup.ShingleDfCap // hot shingle df = 3x over the cap
    // every doc carries hot shingle 0 plus two private shingles — the
    // hot bucket alone would emit n(n-1)/2 candidate pairs un-capped
    val sh = (0 until n).flatMap { d =>
      Seq((d.toLong, 0L), (d.toLong, 100L + 2 * d), (d.toLong, 101L + 2 * d))
    }.toDF("doc_id", "sh")
    val capped = Dedup.capByDf(sh)
    assert(capped.filter(col("sh") === 0L).count() == 0, "hot shingle must be dropped")
    assert(capped.count() == 2L * n, "private shingles must survive")
    val candidates = capped.as("a")
      .join(capped.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(candidates == 0,
      s"hot-shingle bucket leaked $candidates quadratic candidate pairs")
    // below-cap shingles are untouched
    val small = Seq((1L, 7L), (2L, 7L), (3L, 8L)).toDF("doc_id", "sh")
    assert(Dedup.capByDf(small).count() == 3)
  }

  test("d5 cosine near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.d5EmbeddingNeardup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
