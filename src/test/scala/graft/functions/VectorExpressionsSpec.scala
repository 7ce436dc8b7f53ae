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

  test("nearest-centroid kernels: NaN max returns the first NaN position, never -1") {
    // A NaN dot is greatest under Spark's (and DuckDB's) NaN ordering, and
    // NaN = NaN is true in both engines, so the composed
    // array_position(dots, array_max(dots)) - 1 form lands on the FIRST
    // NaN's index. The kernels must agree — a -1 here would flow into
    // element_at(..., 0) in ivf2Train/pqCodebooks and throw at runtime.
    val nan = Double.NaN
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(2.0, 2.0))
    val df = Seq(
      (1L, Array(nan, 0.0)),   // all three dots NaN -> first position 0
      (2L, Array(3.0, 4.0)),   // clean row -> argmax = 2
      (3L, Array(0.0, nan))    // NaN*0 = NaN too: all dots NaN -> 0
    ).toDF("id", "v")
    val viaLit = df.select(col("id"), nearest_centroid(col("v"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaLit === Map(1L -> 0, 2L -> 2, 3L -> 0))
    val matDf = Seq(Tuple1(cents.map(_.toSeq))).toDF("mats")
    val viaDyn = df.crossJoin(broadcast(matDf))
      .select(col("id"), nearest_centroid_dyn(col("v"), col("mats")).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaDyn === viaLit, "dynamic kernel must match the literal kernel on NaN rows")
    // composed-form cross-check: array_position over the same dots
    val composed = df.select(col("id"),
      (array_position(
        array(cents.map(c => dot_product(col("v"), lit(c))): _*),
        array_max(array(cents.map(c => dot_product(col("v"), lit(c))): _*))) - 1).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(composed === viaLit, "kernels must match Spark's composed array_position form")
    // mixed dots (finite vector, one NaN centroid — a hostile corpus can
    // produce NaN Lloyd centroids): dots = [1, NaN, 1] -> first NaN at 1
    val cents2 = Seq(Array(1.0, 0.0), Array(nan, 0.0), Array(0.0, 1.0))
    val mixed = Seq((9L, Array(1.0, 1.0))).toDF("id", "v")
    val gotMixed = mixed.select(nearest_centroid(col("v"), cents2)).collect()(0).getInt(0)
    assert(gotMixed === 1, "NaN dot is greatest; its first position wins")
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
