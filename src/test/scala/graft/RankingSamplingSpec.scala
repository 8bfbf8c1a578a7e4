package graft

import graft.operators.{Dedup, Ranking, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q59-q61: passage dedup, language rebalancing, block-wise global rank. */
class RankingSamplingSpec extends SparkSuite {

  import graft.SparkSuite.implicits._

  test("globalRank equals a global window on tied, gapped, multi-block data") {
    // values collide across blocks (v = id % 7), ids are gapped
    val rows = (0L until 400L).map(_ * 3 + 1).map(id => (id, id % 7))
    val df = rows.toDF("doc_id", "v")
    val got = Ranking.globalRank(df, "v", "doc_id", blockSize = 50L)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rank",
        row_number().over(Window.orderBy($"v", $"doc_id")).cast("long"))
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRank rejects work-column clashes case-insensitively") {
    // Spark resolves column names case-insensitively: an input column
    // 'BLK' or 'Rank' would be clobbered just like the lower-case form
    val df = Seq((1L, 2L, 3L)).toDF("doc_id", "v", "BLK")
    val e = intercept[IllegalArgumentException] {
      Ranking.globalRank(df, "v", "doc_id")
    }
    assert(e.getMessage.contains("BLK"))
    val df2 = Seq((1L, 2L, 3L)).toDF("doc_id", "v", "Rank")
    intercept[IllegalArgumentException] {
      Ranking.globalRank(df2, "v", "doc_id")
    }
  }

  test("length deciles: buckets are contiguous in rank and near-equal-sized") {
    val d = Ranking.lengthDeciles(spark, sf)
      .select($"rank", $"decile").as[(Long, Long)].collect().sortBy(_._1)
    val n = d.length
    assert(d.map(_._1).toSeq == (1L to n).toSeq) // ranks are a permutation
    assert(d.map(_._2).toSeq == d.map(_._2).sorted.toSeq) // monotone in rank
    val sizes = d.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((0L until 10L).toSet))
    assert(sizes.values.forall(s => (s - n / 10).abs <= 1))
  }

  test("passage dedup strips repeated blocks everywhere but the first doc") {
    val shared = (1 to Dedup.PassageWords).map(i => s"dup$i").mkString(" ")
    val a = (1 to Dedup.PassageWords).map(i => s"a$i").mkString(" ")
    val b = (1 to Dedup.PassageWords).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (10L, s"$a $shared"),      // canonical holder of the shared block
      (20L, s"$shared $b"),      // loses it (keeps b)
      (30L, shared),             // entirely boilerplate -> empty text
      (40L, "short tail")        // sub-block doc, unique, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedupFrom(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(10L) == ((2L, 2L, s"$a $shared")))
    assert(out(20L) == ((2L, 1L, b)))
    assert(out(30L) == ((1L, 0L, "")))
    assert(out(40L) == ((1L, 1L, "short tail")))
  }

  test("passage dedup reassembles surviving blocks in original order") {
    val blocks = (0 until 5).map(k =>
      (1 to Dedup.PassageWords).map(i => s"w${k}_$i").mkString(" "))
    val docs = Seq((1L, blocks.mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.passageDedupFrom(docs)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 5L, 5L, blocks.mkString(" "))))
  }

  test("funnel stages are strictly causally ordered") {
    import org.apache.spark.sql.functions._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def t(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val ev = Seq(
      // A: full ordered funnel -> stage 3
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // B: click BEFORE the first view never counts -> stage 1
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)),
      // C: purchase before the qualifying click -> stage 2
      (3L, "view", t(1)), (3L, "purchase", t(2)), (3L, "click", t(3)),
      // D: no funnel events at all -> stage 0
      (4L, "signup", t(1))
    ).toDF("user_id", "event_type", "ts")
    val got = graft.operators.Relational.funnelFrom(ev)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("char-trigram langid beats chance and is diagonal-dominant") {
    val rows = graft.operators.TextAnalysis.charLangId(spark, sf)
      .select($"labeled_lang", $"predicted_lang").as[(String, String)].collect()
    val langs = rows.map(_._1).distinct
    assert(rows.forall { case (_, p) => langs.contains(p) || p == "und" })
    val acc = rows.count(r => r._1 == r._2).toDouble / rows.length
    // deterministic 0.322 on this corpus (5 langs share a common word
    // pool — chance is 0.2); floor guards degenerate regressions
    assert(acc >= 0.25, s"accuracy $acc")
    // for most languages the modal prediction is the true language
    val diagonal = langs.count { l =>
      val preds = rows.filter(_._1 == l).groupBy(_._2).view.mapValues(_.size)
      preds.maxBy { case (p, n) => (n, p) }._1 == l
    }
    assert(diagonal >= 3, s"only $diagonal/${langs.length} languages diagonal-dominant")
  }

  test("lang balance keeps the smallest language whole and shrinks the rest") {
    val docs = ((0L until 40L).map((_, "en")) ++ (40L until 50L).map((_, "fr")))
      .map { case (id, l) => (id, l, s"src$id") }.toDF("doc_id", "lang", "source")
    val kept = Sampling.langBalanceFrom(docs)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // n_lang == n_target => pmod(h, n) < n always: the min stratum survives intact
    assert(byLang("fr") == 10)
    assert(byLang("en") < 40) // dominant language strictly downsampled
    // deterministic: a second run selects the identical rows
    val again = Sampling.langBalanceFrom(docs)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("cluster balance keeps the smallest cell whole and damps the rest") {
    import org.apache.spark.sql.functions._
    val cells = operators.Similarity.hierCells(spark, sf)
      .select(col("vec_id"), col("tc")(0)("id").as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val sizes = cells.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nMin = sizes.values.min
    val kept = operators.Sampling.clusterBalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kept.nonEmpty)
    // thresholds follow sqrt(n_min/n_cell): the smallest cell's ppm is
    // the full scale (every member kept); larger cells are damped
    val keptBy = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    sizes.filter(_._2 == nMin).keys.foreach { c =>
      assert(keptBy.getOrElse(c, 0L) == nMin, s"min cell $c not intact")
    }
    kept.foreach { case (_, c, ppm) =>
      val want = math.floor(math.sqrt(nMin.toDouble / sizes(c)) * operators.Sampling.MixScale).toLong
      assert(ppm == want, s"cell $c ppm $ppm != $want")
    }
    // every kept vec belongs to the cell the index assigned it
    val cellOf = cells.toMap
    kept.foreach { case (v, c, _) => assert(cellOf(v) == c) }
  }

  test("q119 priority sample matches the driver-side DLT selection and estimates the total weight") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pri = docs.map { case (id, w) =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"pri_$id").substring(0, 7), 16)
      (id, w, w.toDouble * operators.Sampling.PriorityGrid / (h + 1).toDouble)
    }
    val ordered = pri.sortBy { case (id, _, q) => (-q, id) }
    val tau = ordered(operators.Sampling.PriorityN)._3
    val want = ordered.take(operators.Sampling.PriorityN).zipWithIndex
      .map { case ((id, w, q), i) => (i + 1L, id, w, q, tau, math.max(w.toDouble, tau)) }
    val got = operators.Sampling.prioritySample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length == operators.Sampling.PriorityN)
    // selection, rank order, tau, and the estimator column are exact
    got.zip(want).foreach { case ((gr, gid, gw, gq, gt, ge), (wr, wid, ww, wq, wt, _)) =>
      assert((gr, gid, gw) == (wr, wid, ww))
      assert(gq == wq && gt == wt)
      assert(ge == math.max(gw.toDouble, gt))
      assert(gq >= gw.toDouble, "priority = w/u with u <= 1 is never below w")
    }
    // DLT unbiasedness: the sample-sum estimator lands near the true total
    val est = got.map(_._6).sum
    val truth = docs.map(_._2).sum.toDouble
    assert(math.abs(est - truth) / truth < 0.25, s"est=$est truth=$truth")
  }
}
