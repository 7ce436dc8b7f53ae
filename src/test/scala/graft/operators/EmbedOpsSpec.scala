package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stub encoder is deterministic and distinct-first (same text → one vector)") {
    val passages = Seq(
      (1L, 0L, "alpha beta gamma"),
      (2L, 0L, "alpha beta gamma"), // same text in a different doc
      (3L, 0L, "delta eps zeta"))
      .toDF("doc_id", "passage_id", "passage")
    val encoded = EmbedOps.encodeDistinct(passages, "passage", dim = 16)
    assert(encoded.count() === 2L, "distinct texts encode once")

    val attached = EmbedOps.attachEmbeddings(passages, encoded, "passage")
    assert(attached.filter(col("embedding").isNull).count() === 0L,
      "every passage gets a vector")
    val vecs = attached.filter(col("doc_id") =!= 3L)
      .select("embedding").collect().map(_.getSeq[Double](0))
    assert(vecs(0) === vecs(1), "equal text must get the identical vector")
    assert(vecs(0).length === 16)
    assert(vecs(0).forall(x => x >= -1.0 && x < 1.0), "components stay in [-1, 1)")
  }

  test("embed_attach covers every text_passages row at sf0.001") {
    val passages = NormOps.textPassages(
      graft.Tables.documents(spark, sfDir), "text", splitLength = 60, overlap = 15)
    val out = EmbedOps.qEmbedAttach(spark, sfDir)
    assert(out.count() === passages.count(), "attach must not drop or duplicate passages")
    assert(out.filter(col("n_dims") =!= 64L).count() === 0L)
    assert(out.filter(col("norm").isNull || col("norm") <= 0.0).count() === 0L,
      "every stub vector has a positive norm")
  }
}
