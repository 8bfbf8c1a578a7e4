package graft

import org.apache.spark.sql.functions._

/** Round-17 graded operators: k-center diversity seeds, cluster
  * validity indices, directional source-gram leakage, packed-shard
  * attention-mask planning. */
class Round17OpsSpec extends SparkSuite {

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) {
      val d = a(i) - b(i); s += d * d; i += 1
    }
    s
  }

  test("q362 k-center seeds match a driver-side maximin recomputation") {
    val got = graft.operators.Similarity.kcenterSeeds(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val vs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    var seeds = List(vs.keys.min)
    var want = List((1, seeds.head, 0L))
    for (r <- 2 to graft.operators.Similarity.KcenterK) {
      val cand = vs.keys.filterNot(seeds.contains).map { vid =>
        val md = seeds.map(s => math.floor(l2sq(vs(vid), vs(s)) * 1e6).toLong).min
        (md, vid)
      }
      val (md, vid) = cand.maxBy { case (m, v) => (m, -v) }
      seeds ::= vid
      want ::= ((r, vid, md))
    }
    assert(got.toList == want.reverse)
    // radii are non-increasing: each new seed covers no worse than the last
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"maximin radius sequence must be non-increasing: ${radii.mkString(",")}")
  }

  test("q363 cluster validity matches a driver-side recomputation from the assignment") {
    val row = graft.operators.Similarity.clusterValidity(spark, sf).collect().head
    val asg = graft.operators.Similarity.hierCells(spark, sf)
      .select(col("vec_id"), col("tc")(0)("id").cast("long").as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cb = graft.operators.Similarity.trainedCodebook(spark, sf)
      .select(col("cent_id").cast("long"), col("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val d2u = asg.toSeq.map { case (vid, c) =>
      c -> math.floor(l2sq(vs(vid), cb(c)) * 1e6).toLong
    }
    val perCell = d2u.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.size.toLong, xs.map(_._2).sum)
    }
    val dims = vs.values.head.length
    val gv = (0 until dims).map { d =>
      val m = vs.values.map(_(d)).sum / vs.size
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toArray
    val g2u = perCell.keys.map(c => c -> math.floor(l2sq(cb(c), gv) * 1e6).toLong).toMap
    val k = perCell.size.toLong
    val n = perCell.values.map(_._1).sum
    val w = perCell.values.map(_._2).sum
    val b = perCell.map { case (c, (ni, _)) => ni * g2u(c) }.sum
    assert(row.getAs[Long]("n_vecs") == n)
    assert(row.getAs[Long]("k_cells") == k)
    assert(row.getAs[Long]("w_u") == w)
    assert(row.getAs[Long]("b_u") == b)
    val ch = (b.toDouble / (k - 1)) / (w.toDouble / (n - k))
    assert(math.abs(row.getAs[Double]("calinski_harabasz") - ch) < 1e-5)
    // DB: worst confused pair per cluster on the same micro grid
    def s(c: Long) = math.sqrt(perCell(c)._2.toDouble / perCell(c)._1 / 1e6)
    // toSeq: keys is a Set, and mapping to worst_u on a Set would
    // collapse clusters that happen to share a worst value
    val worst = perCell.keys.toSeq.map { i =>
      perCell.keys.filter(_ != i).map { j =>
        math.floor((s(i) + s(j)) / math.sqrt(math.max(l2sq(cb(i), cb(j)), 1e-12)) * 1e6).toLong
      }.max
    }
    val db = worst.sum.toDouble / worst.size / 1e6
    assert(math.abs(row.getAs[Double]("davies_bouldin") - db) < 1e-5)
    assert(ch > 0 && db > 0)
  }

  test("q364 source gram leakage matches a driver recomputation and is directional") {
    val got = graft.operators.TextAnalysis.sourceGramLeakage(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_grams_a"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("containment_ppm"))).toMap
    val k = graft.operators.TextAnalysis.LeakageGramK
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // the operator (and its oracle) count DISTINCT md5-28 HASHES, so
    // the recompute must hash too: at ~10^5 grams per source, 28-bit
    // birthday collisions are expected and both engines share them
    def md5h28(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString.take(7), 16)
    }
    val gramsBySrc = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap { case (_, t) =>
        val w = t.split("[ \t\n\r]+").filter(_.nonEmpty)
        if (w.length < k) Seq.empty
        else w.sliding(k).map(g => md5h28(g.mkString("_"))).toSeq
      }.toSet
    }
    val srcs = gramsBySrc.keys.toSeq.sorted
    assert(got.size == srcs.size * (srcs.size - 1))
    for (a <- srcs; b <- srcs if a != b) {
      val ga = gramsBySrc(a); val gb = gramsBySrc(b)
      val shared = (ga & gb).size.toLong
      val (na, ns, ppm) = got((a, b))
      // the operator counts md5-28 HASHES; at test scale collisions are
      // absent, so string-set counts must agree exactly
      assert(na == ga.size.toLong, s"($a,$b) n_grams_a")
      assert(ns == shared, s"($a,$b) n_shared")
      assert(ppm == shared * 1000000L / ga.size, s"($a,$b) ppm")
    }
    // directionality is representable: the matrix stores (a,b) and
    // (b,a) independently (values may coincide on symmetric corpora)
    val (a, b) = (srcs.head, srcs.last)
    assert(got.contains((a, b)) && got.contains((b, a)))
  }

  test("q365 pack mask stats match a driver recomputation over the q53 packing") {
    val got = graft.operators.Packing.packMaskStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val budget = graft.operators.Packing.ShardBudget
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("[ \t\n\r]+").count(_.nonEmpty).toLong))
      .sortBy(_._1)
    var pre = 0L
    val packed = docs.map { case (id, n) =>
      val row = (id, n, pre, pre / budget); pre += n; row
    }
    val shardStart = packed.groupBy(_._4).map { case (s, xs) => s -> xs.map(_._3).min }
    val total = docs.map(_._2).sum
    for (w <- graft.operators.Packing.MaskWindows) {
      val contaminated = packed.map { case (_, n, p, s) =>
        if (p > shardStart(s)) math.min(n, w - 1) else 0L
      }.sum
      val (t, c, ppm) = got(w)
      assert(t == total, s"w=$w total")
      assert(c == contaminated, s"w=$w contaminated")
      assert(ppm == contaminated * 1000000L / total, s"w=$w ppm")
    }
    // monotone in w: a wider window can only see more foreign tokens
    val cs = graft.operators.Packing.MaskWindows.map(got(_)._2)
    assert(cs.zip(cs.tail).forall { case (x, y) => x <= y })
  }
}
