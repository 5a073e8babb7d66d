package graft

import org.apache.spark.sql.functions._

import graft.multimodal.BinaryColumns
import graft.text.TextOps

class TextSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)

  test("langid predicts a language for every doc, scores consistent") {
    val l = TextOps.langId(docs).cache()
    assert(l.filter(col("lang_pred").isNull).count() == 0)
    // when predicted 'en', en-score must be the max
    val bad = l.filter(col("lang_pred") === "en" &&
      (col("score_en") < col("score_es") || col("score_en") < col("score_fr"))).count()
    assert(bad == 0)
    l.unpersist()
  }

  test("quality features are in range") {
    val q = TextOps.qualityScore(docs)
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    assert(q.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("token counts: regex tokens >= whitespace tokens on word corpus") {
    val t = TextOps.tokenCounts(docs)
    assert(t.filter(col("n_re_tokens") < col("n_ws_tokens")).count() == 0)
  }

  test("binary plumbing: metadata survives parquet round-trip") {
    val meta = BinaryColumns.binaryMeta(spark, docs)
    val path = java.nio.file.Files.createTempDirectory("graft_mm").toString
    meta.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.schema("n_bytes").dataType.typeName == "long")
    // decode is deterministic: width derived from byte length
    assert(back.filter(col("width") =!= (col("n_bytes") % 64) + 1).count() == 0)
  }
}
