package graft

import graft.operators.{Multimodal, MultimodalDecoder, MediaBlob}

class MultimodalSpec extends SparkSuite {

  test("decoded features are consistent with source documents") {
    import graft.SparkSuite.implicits._
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
    import graft.SparkSuite.implicits._
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

  /** A real PNG byte-array built through the JDK encoder: a w×h gradient
    * (deterministic pixel values) round-tripped through ImageIO.write —
    * genuine PNG file bytes (signature, IHDR, IDAT), not a fixture. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) | ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG decode: dimensions, luma and pixel digest from actual image bytes") {
    val bytes = pngBytes(24, 16)
    // PNG signature proves these are real file bytes
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte)
    val f = MultimodalDecoder.decodeImage(MediaBlob(42L, "image/png", bytes, bytes.length)).get
    assert(f.width == 24 && f.height == 16)
    assert(f.doc_id == 42L && f.n_bytes == bytes.length)
    assert(f.mean_luma > 0.0 && f.mean_luma < 255.0)
    assert(f.pixel_md5.length == 32)
    // the digest is over PIXELS, not bytes: the same image re-encoded
    // (losslessly, via a fresh ARGB round-trip) digests identically
    val again = MultimodalDecoder.decodeImage(MediaBlob(43L, "image/png", bytes, bytes.length)).get
    assert(again.pixel_md5 == f.pixel_md5 && again.mean_luma == f.mean_luma)
    // undecodable bytes -> None, not an exception
    assert(MultimodalDecoder.decodeImage(MediaBlob(1L, "image/png", Array[Byte](1, 2, 3), 3)).isEmpty)
    assert(MultimodalDecoder.decodeImage(MediaBlob(2L, "image/png", Array.emptyByteArray, 0)).isEmpty)
  }

  test("real image resize: re-encoded PNG decodes at the target dimensions") {
    val bytes = pngBytes(32, 32)
    val r = MultimodalDecoder.resizeImage(MediaBlob(7L, "image/png", bytes, bytes.length), 8, 8)
    assert(r.media_type == "image/png" && r.n_bytes == r.content.length)
    val back = MultimodalDecoder.decodeImage(r).get
    assert(back.width == 8 && back.height == 8)
    // non-image payloads fall back to the byte-truncation contract
    val stub = MultimodalDecoder.resizeImage(MediaBlob(8L, "text", Array.fill(100)(7.toByte), 100), 4, 4)
    assert(stub.n_bytes == 16)
  }

  test("image decode runs distributed through the mapPartitions boundary") {
    import graft.SparkSuite.implicits._
    val blobs = (1L to 12L).map { i =>
      val b = pngBytes(8 + i.toInt, 8)
      MediaBlob(i, "image/png", b, b.length)
    } :+ MediaBlob(99L, "image/png", Array[Byte](0, 1, 2), 3) // corrupt row drops
    val ds = spark.createDataset(blobs).repartition(4)
    val out = Multimodal.imageFeatures(ds).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(out.size == 12 && !out.contains(99L))
    (1L to 12L).foreach(i => assert(out(i) == (8 + i.toInt, 8)))
  }

  test("frame sampling fans one blob into n distributed frame rows") {
    import graft.SparkSuite.implicits._
    val n = 4
    val frames = graft.operators.Multimodal.frames(spark, sf, n).collect()
    val nBlobs = graft.sources.Tables.documents(spark, sf).count()
    assert(frames.length == n * nBlobs)
    frames.groupBy(_.doc_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == (0 until n))
      assert(fs.forall(_.n_bytes > 0))
    }
  }

  test("sampleFrames: AVI video decodes real frames, unknown codec fails loudly") {
    import graft.operators.{MediaBlob, MultimodalDecoder}
    // real path: an AVI blob yields frames whose stats come from the
    // DECODED payloads, not byte slices of the container
    val payloads = Seq(
      Array.tabulate(13)(_.toByte), Array.tabulate(64)(i => (i * 3).toByte),
      Array.tabulate(7)(i => (255 - i).toByte))
    val avi = Multimodal.aviBytes(payloads, 8, 8)
    val blob = MediaBlob(7L, "video/avi", avi, avi.length)
    val fs = MultimodalDecoder.sampleFrames(blob, 3)
    assert(fs.length == 3)
    assert(fs.map(_.n_bytes) == payloads.map(_.length))
    assert(fs.map(_.first_byte) == payloads.map(_(0) & 0xff))
    // loud path: an interframe codec must raise with the codec name,
    // never emit plausible-looking pseudo-frames
    val opaque = MediaBlob(8L, "video/h264",
      Array.tabulate(256)(_.toByte), 256)
    val e = intercept[IllegalArgumentException] {
      MultimodalDecoder.sampleFrames(opaque, 4)
    }
    assert(e.getMessage.contains("video/h264"))
    assert(e.getMessage.contains("doc 8"))
    // non-video media keep the byte-slice fan-out demonstration
    val text = MediaBlob(9L, "text", "hello world".getBytes, 11)
    assert(MultimodalDecoder.sampleFrames(text, 4).length == 4)
  }

  test("AVI container round-trip: build, parse, recover every frame byte-exact") {
    // distinct payload sizes (odd + even) exercise the RIFF pad rule
    val payloads = Seq(
      Array.tabulate(13)(_.toByte), Array.tabulate(64)(i => (i * 3).toByte),
      Array.tabulate(7)(i => (255 - i).toByte))
    val avi = Multimodal.aviBytes(payloads, 8, 8)
    // spot-check the layout: RIFF magic, AVI type, declared size = file
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val riffSize = java.nio.ByteBuffer.wrap(avi, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffSize + 8 == avi.length)
    val (declared, frames) = Multimodal.parseAviFrames(avi)
    assert(declared == 3 && frames.length == 3)
    payloads.zip(frames).foreach { case (p, f) => assert(p.toSeq == f.toSeq) }
  }

  test("q356 video codec proof: parsed+decoded frame stats equal the generating arithmetic") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.videoFrames(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % Multimodal.VideoEvery === 0).count()
    assert(out.length == Multimodal.VideoFrames * nDocs)
    val n = Multimodal.VideoSide * Multimodal.VideoSide
    // independently recompute a sample of frames from the arithmetic
    val hs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % Multimodal.VideoEvery === 0)
      .select(col("doc_id"),
        graft.functions.HashFunctions.md5Int60(col("text")).as("h"))
      .orderBy("doc_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(r => hs.contains(r.getLong(0))).foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      val h = hs(id)
      val want = (0 until n).map(i =>
        ((h % 1048576L) * 31L + f * 131L + i * 97L + (i.toLong * i) % 251L) % 256L).sum
      assert(r.getLong(2) == 8L && r.getLong(3) == 8L)
      assert(r.getLong(4) == want, s"gray_sum mismatch doc $id frame $f")
      assert(r.getLong(5) == want / n)
    }
  }
}
