package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based checks over the engine's primitives: ScalaCheck
  * generators (seeded, deterministic) drive generated inputs against
  * driver-side reference semantics. */
class PropertiesSpec extends SparkSuite {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("tokenizer matches the reference regex semantics on generated text") {
    import graft.SparkSuite.implicits._
    (1 to 10).foreach { seed =>
      val texts = draw(Gen.listOfN(20, text), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val got = df.select(col("id"), graft.functions.TextFunctions.alphaTokens(col("t")).as("w"))
        .as[(Long, Seq[String])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val expected = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
        assert(got(i.toLong) == expected, s"seed=$seed text='$t'")
      }
    }
  }

  test("MapReduce.runReduced equals a driver-side groupBy-sum on generated pairs") {
    import graft.SparkSuite.implicits._
    val pair = for { k <- Gen.choose(0, 5); v <- Gen.choose(-100L, 100L) } yield (s"k$k", v)
    (1 to 5).foreach { seed =>
      val pairs = draw(Gen.listOfN(200, pair), seed)
      val got = graft.core.MapReduce.runReduced[(String, Long), String, Long](
        pairs.toDS(), p => Iterator.single(p), _ + _).collect().toMap
      val expected = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("globalRank equals driver-side sorting on generated skewed data") {
    import graft.SparkSuite.implicits._
    // heavy ties (few distinct values), gapped ids, sizes straddling
    // several rank blocks
    val row = for {
      id <- Gen.choose(0L, 5000L)
      v <- Gen.choose(0L, 6L)
    } yield (id, v)
    (1 to 5).foreach { seed =>
      val rows = draw(Gen.listOfN(300, row), seed)
        .groupBy(_._1).map(_._2.head).toSeq // ids must be unique
      val df = rows.toDF("id", "v")
      val got = graft.operators.Ranking.globalRank(df, "v", "id", blockSize = 100L)
        .select($"id", $"rank").as[(Long, Long)].collect().toMap
      val expected = rows.sortBy { case (id, v) => (v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("rolling-hash windows equal direct hashes for generated strings") {
    val gen = for {
      n <- Gen.chooseNum(0, 64)
      s <- Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString)
      w <- Gen.choose(1, 12)
    } yield (s, w)
    (1 to 200).foreach { seed =>
      val (s, w) = draw(gen, seed)
      val bytes = s.getBytes("UTF-8")
      val got = org.apache.spark.sql.graft.RollingHash.compute(bytes, w).toSeq
      val expected =
        if (bytes.length < w) Seq.empty
        else (0 to bytes.length - w).map { i =>
          var h = 0L
          bytes.slice(i, i + w).foreach(b => h = (h * 131 + (b & 0xff)) % 2147483647L)
          h
        }
      assert(got == expected, s"seed=$seed s='$s' w=$w")
    }
  }

  test("affine hash family stays within [0, P) for valid base hashes") {
    val gen = for {
      h <- Gen.choose(0L, (1L << 28) - 1)
      i <- Gen.choose(0, 127)
    } yield (h, i)
    (1 to 500).foreach { seed =>
      val (h, i) = draw(gen, seed)
      val m = ((2L * i + 1) * h + 101L * i + 7) % graft.functions.HashFunctions.P
      assert(m >= 0L && m < graft.functions.HashFunctions.P)
    }
  }

  test("salted bucket self-join equals naive all-pairs for ANY bucket layout and cap") {
    import graft.SparkSuite.implicits._
    val assignment = for {
      nBuckets <- Gen.choose(1, 6)
      n <- Gen.choose(1, 120)
      ks <- Gen.listOfN(n, Gen.choose(0, nBuckets - 1))
    } yield ks.zipWithIndex.map { case (k, id) => (s"b$k", id.toLong) }
    (1 to 5).foreach { seed =>
      val rows = draw(assignment, seed).distinct
      val cap = draw(Gen.choose(1, 40), seed + 1000)
      val df = rows.toDF("k", "id")
      val got = graft.operators.CandidatePairs.boundedSelfJoin(df, Seq("k"), "id", cap)
        .as[(Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).values.flatMap { members =>
        val ids = members.map(_._2).sorted
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(got == expected, s"seed=$seed cap=$cap")
    }
  }

  test("block-wise shard packing equals a sequential cumsum on gapped id spaces") {
    import graft.SparkSuite.implicits._
    import graft.operators.Packing
    val corpus = for {
      n <- Gen.choose(0, 400)
      ids <- Gen.listOfN(n, Gen.choose(0L, 10000L)).map(_.distinct.sorted)
      lens <- Gen.listOfN(ids.size, Gen.choose(0L, 900L))
    } yield ids.zip(lens)
    (1 to 5).foreach { seed =>
      val docs = draw(corpus, seed)
      val got = Packing.packFrom(docs.toDF("doc_id", "n").repartition(8))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      var pre = 0L
      val want = docs.map { case (id, n) =>
        val s = pre / Packing.ShardBudget; pre += n; (s, id, n)
      }.groupBy(_._1).map { case (s, rows) =>
        s -> (rows.length.toLong, rows.map(_._3).sum, rows.map(_._2).min, rows.map(_._2).max)
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("TopKBuffer add/merge equals sort-take under arbitrary splits") {
    import org.apache.spark.sql.graft.TopKBuffer
    val entries = Gen.listOf(Gen.zip(
      Gen.choose(0, 8).map(_ / 4.0), // coarse scores force tie-breaks
      Gen.choose(0L, 30L)))
    (1 to 20).foreach { seed =>
      val xs = draw(entries, seed)
      val k = draw(Gen.choose(1, 6), seed + 500)
      val cut = if (xs.isEmpty) 0 else draw(Gen.choose(0, xs.size), seed + 900)
      // two partial buffers merged — exercises the shuffle merge path
      val b1 = new TopKBuffer(k); val b2 = new TopKBuffer(k)
      xs.take(cut).foreach { case (s, i) => b1.add(s, i) }
      xs.drop(cut).foreach { case (s, i) => b2.add(s, i) }
      (0 until b2.n).foreach(i => b1.add(b2.scores(i), b2.ids(i)))
      val got = (0 until b1.n).map(i => (b1.scores(i), b1.ids(i))).toList
      // multiset semantics: duplicates rank separately, same as
      // row_number over duplicate rows
      val want = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == want, s"seed=$seed k=$k cut=$cut got=$got want=$want")
    }
  }

  test("domain cap equals a driver-side hash-rank on generated skew") {
    import graft.SparkSuite.implicits._
    val row = for {
      id <- Gen.choose(0L, 500L)
      src <- Gen.oneOf("hot", "warm", "cold") // skewed source mix
    } yield (id, src)
    (1 to 5).foreach { seed =>
      val rows = draw(Gen.listOfN(120, row), seed).distinctBy(_._1)
      val n = draw(Gen.choose(1, 10), seed + 13)
      val got = graft.operators.Sampling
        .domainCapFrom(rows.toDF("doc_id", "source"), n)
        .select($"source", $"doc_id", $"cap_rank")
        .as[(String, Long, Long)].collect().toSet
      // reference: md5-28-bit order per source, take n
      def h(id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"cap_$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 7), 16)
      }
      val want = rows.groupBy(_._2).flatMap { case (src, members) =>
        members.map(_._1).sortBy(id => (h(id), id)).take(n).zipWithIndex
          .map { case (id, i) => (src, id, (i + 1).toLong) }
      }.toSet
      assert(got == want, s"seed=$seed n=$n")
    }
  }

  test("pagerank conserves mass on generated undirected graphs") {
    import graft.SparkSuite.implicits._
    val edge = Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L))
      .suchThat { case (a, b) => a != b }
    (1 to 3).foreach { seed =>
      val pairs = draw(Gen.nonEmptyListOf(edge), seed)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val out = graft.operators.Graph.pageRankFrom(pairs.toDF("doc_a", "doc_b"))
        .select($"doc_id", $"pagerank").as[(Long, Double)].collect()
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      assert(out.map(_._1).toSet == nodes.toSet, s"seed=$seed node set")
      assert(math.abs(out.map(_._2).sum - 1.0) < 1e-4, s"seed=$seed mass")
      assert(out.forall(_._2 > 0), s"seed=$seed positivity")
    }
  }
}
