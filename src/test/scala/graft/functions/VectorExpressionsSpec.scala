package graft.functions

import graft.SparkSpec
import graft.functions.VectorFns._
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product and cosine_sim match hand-computed values") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, -5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      dot_product(col("a"), col("b")).as("dot"),
      cosine_sim(col("a"), col("a")).as("self"),
      cosine_sim(col("a"), col("b")).as("cos")).collect()(0)
    assert(r.getAs[Double]("dot") === (4.0 - 10.0 + 18.0))
    assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-12)
    val expected = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getAs[Double]("cos") - expected) < 1e-12)
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val vecs = graft.operators.AnnOps.corpus(spark, sfDir).limit(50)
    val pairs = vecs.select(col("vec_id").as("i"), col("v").as("a"))
      .crossJoin(vecs.select(col("vec_id").as("j"), col("v").as("b")))
      .filter(col("i") < col("j"))
    val viaExpr = pairs.select(col("i"), col("j"), cosine_sim(col("a"), col("b")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // interpreted HOF reference formulation (the pre-expression implementation)
    def dotH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val viaHof = pairs.select(col("i"), col("j"),
      (dotH(col("a"), col("b")) / (sqrt(dotH(col("a"), col("a"))) * sqrt(dotH(col("b"), col("b"))))).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    viaExpr.foreach { case (k, v) =>
      assert(v === viaHof(k), s"pair $k: expr $v vs hof ${viaHof(k)}")
    }
  }

  test("orthogonal and opposite vectors") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), "orth"),
      (Array(1.0, 1.0), Array(-1.0, -1.0), "opp")).toDF("a", "b", "k")
    val got = df.select(col("k"), cosine_sim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("orth") === 0.0)
    assert(math.abs(got("opp") + 1.0) < 1e-12)
  }
}
