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

  test("decoder handles empty content without throwing") {
    val f = MultimodalDecoder.decode(MediaBlob(7L, "image", Array.emptyByteArray, 0))
    assert(f.first_byte == -1 && f.last_byte == -1 && f.n_bytes == 0)
  }
}
