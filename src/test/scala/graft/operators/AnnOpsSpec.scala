package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnOpsSpec extends SparkSpec {

  test("lshTopK recall vs brute force beats random candidate selection") {
    val vecs = AnnOps.corpus(spark, sfDir)
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val exact = AnnOps.bruteTopK(vecs, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnOps.lshTopK(vecs, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"LSH recall@10 = $recall%.3f (${approx.size} approx pairs, ${exact.size} exact)")
    // This corpus's true top-10 neighbors sit at cosine ~0.3 (near-random
    // vectors) — the hard regime for sign-LSH. 8 tables × 5 bits with 1-bit
    // multiprobe on the query side measures ~0.94 here; 0.7 leaves margin
    // for corpus regeneration without letting a probe regression slip by.
    assert(recall >= 0.7, s"LSH recall $recall below 0.7 (found ${approx.size} pairs)")
  }

  test("lshTopK always finds an exact duplicate (identical buckets in every table)") {
    val vecs = AnnOps.corpus(spark, sfDir)
    val clone = vecs.filter(col("vec_id") === 0)
      .select(lit(99999L).as("vec_id"), col("label"), col("v"))
    val got = AnnOps.lshTopK(vecs.unionByName(clone), clone, k = 1).collect()
    assert(got.length === 1 && got(0).getAs[Long]("neighbor_id") === 0L)
    assert(got(0).getAs[Double]("cos_sim") === 1.0)
  }

  test("brute-force top-1 of a planted duplicate is the duplicate itself") {
    val vecs = AnnOps.corpus(spark, sfDir)
    val spark2 = spark
    import spark2.implicits._
    // plant an exact copy of vec 0 with id 99999
    val clone = vecs.filter(col("vec_id") === 0)
      .select(lit(99999L).as("vec_id"), col("label"), col("v"))
    val exact = AnnOps.bruteTopK(vecs.unionByName(clone), clone, k = 1).collect()
    assert(exact.length === 1)
    assert(exact(0).getAs[Long]("neighbor_id") === 0L)
    assert(exact(0).getAs[Double]("cos_sim") === 1.0)
  }

  test("hyperplanes are deterministic across invocations") {
    val a = AnnOps.hyperplanes(2, 4, 8)
    val b = AnnOps.hyperplanes(2, 4, 8)
    assert(a.flatten.flatten == b.flatten.flatten)
  }
}
