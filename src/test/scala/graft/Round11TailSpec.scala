package graft

import org.apache.spark.sql.functions._

/** Invariant tests for q180-q182: codec-graded image dedup, lossless
  * containment blocking, hopping windows. */
class Round11TailSpec extends SparkSuite {

  test("q180 buckets exactly the exact-text duplicates and the codec round-trip holds") {
    val rows = graft.operators.Multimodal.imageDedup(spark, sf).collect()
    // the synthetic image is a pure function of md5(text): docs with
    // identical TEXT must land in one bucket; distinct texts may collide
    // only on the 64-bit perceptual key (none do on this corpus)
    val textGroups = graft.sources.Tables.documents(spark, sf)
      .groupBy(md5(col("text"))).agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
      .filter(col("n") >= 2)
      .collect().map(r => r.getAs[Long]("rep") -> r.getAs[Long]("n")).toMap
    assert(rows.nonEmpty, "corpus has exact dups — buckets must exist")
    val outReps = rows.map(r => r.getAs[Long]("rep_doc") -> r.getAs[Long]("n_docs")).toMap
    textGroups.foreach { case (rep, n) =>
      assert(outReps.contains(rep), s"dup-text group rep $rep missing from image buckets")
      assert(outReps(rep) >= n)
    }
    rows.foreach { r =>
      val h = r.getAs[String]("ahash")
      assert(h.length == 64 && h.forall(c => c == '0' || c == '1'))
      val mg = r.getAs[Long]("mean_gray")
      assert(mg >= 0 && mg <= 255)
    }
  }

  test("q181 prefix-filter recall is lossless against brute-force containment") {
    import graft.operators.Dedup.ContainmentThreshold
    val rows = graft.operators.Dedup.containmentDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // brute force over the collected shingle sets
    val sets = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingleSet(
          graft.functions.TextFunctions.wsTokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet)
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = sa.intersect(sb).size
      c = math.floor(inter.toDouble / sa.size * 1e6 + 0.5) / 1e6
      if c >= ContainmentThreshold
    } yield (a, b)).toSet
    assert(rows == expect,
      s"prefix filter diverged: missing=${(expect -- rows).take(3)} extra=${(rows -- expect).take(3)}")
    assert(expect.nonEmpty, "corpus must exercise the containment fence")
    // asymmetry is real on this corpus only for non-equal sets; every
    // exact-dup pair appears in BOTH directions
    val exactDupPairs = sets.groupBy(_._2).values.filter(_.length >= 2)
    exactDupPairs.foreach { g =>
      for (x <- g; y <- g if x._1 != y._1)
        assert(rows.contains((x._1, y._1)))
    }
  }

  test("q182 hopping windows cover each event exactly 4 times") {
    val total = graft.streaming.EventStream.hoppingWindowQuery(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val nEvents = graft.sources.Tables.events(spark, sf).count()
    assert(total == 4 * nEvents, "every event must appear in exactly 4 hopping windows")
    // window starts align to the 15-minute grid
    val rows = graft.streaming.EventStream.hoppingWindowQuery(spark, sf).collect()
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    rows.foreach { r =>
      val start = fmt.parse(r.getAs[String]("win_start")).getTime
      assert(start % (15L * 60 * 1000) == 0, "window start off the 15-min grid")
    }
  }
}
