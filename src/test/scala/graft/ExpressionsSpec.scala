package graft

import graft.functions.{HashFunctions => H}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{native, CosineSimilarity}

class ExpressionsSpec extends SparkSuite {

  test("native cosine_sim matches driver-side math and HOF formulation") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = vecs.limit(20).select(col("vec_id").as("a"), col("v").as("va"))
      .crossJoin(vecs.limit(20).select(col("vec_id").as("b"), col("v").as("vb")))
      .filter(col("a") < col("b"))
    val gotNative = pairs
      .select(col("a"), col("b"), native.cosineSim(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val gotHof = pairs
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.cosine(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    assert(gotNative.keySet == gotHof.keySet)
    gotNative.foreach { case (k, c) => assert(math.abs(c - gotHof(k)) < 1e-12) }
  }

  test("native cosine_sim is callable from SQL") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS c").head.getDouble(0)
    assert(math.abs(orth) < 1e-15)
  }

  test("MinHashSignatureAgg equals the k-column min formulation") {
    val exploded = operators.Dedup.shingled(spark, sf)
      .select(col("doc_id"), explode_outer(col("sh")).as("g"))
      .filter(col("g").isNotNull)
      .withColumn("h", H.md5Int28(col("g")))
    val viaAgg = exploded.groupBy("doc_id")
      .agg(native.minhashSignature(col("h"), operators.Dedup.NumHashes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaCols = operators.Dedup.minhashSignatures(spark, sf)
      .collect().map { r =>
        r.getLong(0) -> (0 until operators.Dedup.NumHashes).map(i => r.getLong(i + 1)).toVector
      }.toMap
    assert(viaAgg == viaCols)
  }

  test("GraftExtensions registers without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
