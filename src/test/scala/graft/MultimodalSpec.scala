package graft

import graft.operators.{Multimodal, MultimodalDecoder, MediaBlob}

class MultimodalSpec extends SparkSuite {

  test("decoded features are consistent with source documents") {
    import spark.implicits._
    val feats = Multimodal.features(spark, sf)
      .as[(Long, String, Int, Int, Int, String)].collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    assert(feats.length == docs.size)
    feats.foreach { case (id, mt, nBytes, first, last, checksum) =>
      val text = docs(id)
      assert(mt == "text")
      assert(nBytes == text.getBytes("UTF-8").length)
      assert(first == (text.head & 0xff).toInt)
      assert(last == (text.last & 0xff).toInt)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(checksum == hex)
    }
  }

  test("expression path and mapPartitions decoder path agree row-for-row") {
    import spark.implicits._
    val expr = Multimodal.features(spark, sf)
      .as[(Long, String, Int, Int, Int, String)].collect().toSet
    val decoded = Multimodal.decodedFeatures(spark, sf)
      .as[(Long, String, Int, Int, Int, String)].collect().toSet
    assert(expr == decoded)
    assert(expr.nonEmpty)
  }

  test("decoder handles empty content without throwing") {
    val f = MultimodalDecoder.decode(MediaBlob(7L, "image", Array.emptyByteArray, 0))
    assert(f.first_byte == -1 && f.last_byte == -1 && f.n_bytes == 0)
  }

  test("resize stub bounds the payload to the requested dimensions") {
    val b = MediaBlob(1L, "image", Array.fill(1000)(7.toByte), 1000)
    val r = MultimodalDecoder.resize(b, 8, 8)
    assert(r.n_bytes == 64 && r.content.length == 64 && r.doc_id == 1L)
    val small = MultimodalDecoder.resize(MediaBlob(2L, "image", Array[Byte](1, 2), 2), 8, 8)
    assert(small.n_bytes == 2)
  }

  test("frame sampling fans one blob into n distributed frame rows") {
    import spark.implicits._
    val n = 4
    val frames = graft.operators.Multimodal.frames(spark, sf, n).collect()
    val nBlobs = graft.sources.Tables.documents(spark, sf).count()
    assert(frames.length == n * nBlobs)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == (0 until n))
      assert(fs.forall(_.n_bytes > 0))
    }
  }
}
