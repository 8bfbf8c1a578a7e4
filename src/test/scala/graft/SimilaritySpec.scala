package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {

  /** Independent driver-side cosine ground truth. */
  private lazy val vectors: Map[Long, Array[Double]] =
    graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("brute-force ANN matches driver-side exact top-k") {
    val got = Similarity.annBruteForce(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    val expected = (0L until 10L).map { q =>
      val qv = vectors(q)
      val top = vectors.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Similarity.AnnK).map(_._1)
      q -> top
    }.toMap
    assert(got == expected)
  }

  test("bucketed ANN neighbors are genuine in-bucket top-k") {
    val rows = Similarity.annLsh(spark, sf).collect()
    // every query has at most BucketK neighbors, ranked 1..k with
    // non-increasing cosine
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.length <= Similarity.BucketK)
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      val cosines = sorted.map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("embed-neardup pairs are above threshold and candidates only") {
    val rows = Similarity.embedNeardup(spark, sf).collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      assert(c >= Similarity.CosineThreshold)
      // re-verify the reported cosine against the driver-side computation
      assert(math.abs(c - cosine(vectors(a), vectors(b))) < 1e-5)
    }
  }

  test("IVF with nprobe=2 clears a recall floor vs exact top-3") {
    val got = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = vectors.keys.toSeq.sorted
    val exact = ids.flatMap { q =>
      ids.filter(_ != q)
        .map(n => (n, cosine(vectors(q), vectors(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(Similarity.BucketK)
        .map { case (n, _) => (q, n) }
    }.toSet
    val recall = (got & exact).size.toDouble / exact.size
    // structureless random vectors cap IVF recall (~0.36 measured);
    // the floor guards against regressions to own-cell-only (~0.25)
    assert(recall >= 0.3, s"recall@3 = $recall")
  }

  test("adaptive bucket bits: integer-exact ceil(log2(n/target))") {
    assert(Similarity.adaptiveBits(1) == 1)
    assert(Similarity.adaptiveBits(64) == 1)
    assert(Similarity.adaptiveBits(129) == 2)
    assert(Similarity.adaptiveBits(500) == 3)
    assert(Similarity.adaptiveBits(2000) == 5)
    assert(Similarity.adaptiveBits(2048) == 5)  // exact power boundary
    assert(Similarity.adaptiveBits(2049) == 6)
    assert(Similarity.adaptiveBits(Long.MaxValue / 2) == Similarity.MaxBucketBits)
  }

  test("q17 candidate volume grows ~linearly, not quadratically, with the corpus") {
    val small = "/root/testdata/sf0.01"
    val large = "/root/testdata/sf0.1"
    val e = (d: String) => graft.sources.Tables.embeddings(spark, d)
    val corpusGrowth = e(large).count().toDouble / e(small).count()
    val candGrowth = Similarity.annLshCandidates(spark, large).count().toDouble /
      Similarity.annLshCandidates(spark, small).count()
    // fixed 2^6 buckets would give ~corpusGrowth^2 here; adaptive bits
    // keep expected bucket size constant, so growth tracks the corpus
    // (2x headroom for hash-split granularity: bits move in integer steps)
    assert(candGrowth <= 2.0 * corpusGrowth,
      s"candidates grew ${candGrowth}x for a ${corpusGrowth}x corpus")
  }
}
