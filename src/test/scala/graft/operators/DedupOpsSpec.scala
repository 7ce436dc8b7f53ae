package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu")

  /** Deterministic pseudo-random doc of `n` words seeded by `seed` (a real
    * PRNG stream — an arithmetic formula here yields cyclic word sequences,
    * making docs with different seeds rotations of each other and thus
    * genuine near-duplicates).
    */
  private def doc(seed: Int, n: Int = 60): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  test("dedupExact groups normalized copies and keeps the smallest id") {
    val df = Seq(
      (1L, "Hello World"), (2L, "  hello world "), (3L, "different"))
      .toDF("doc_id", "text")
    val got = DedupOps.dedupExact(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "keep_id", "is_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("minhashPairs finds planted near-duplicates and skips unrelated docs") {
    val base = doc(1, 80)
    val near = base.split(" ").drop(3).mkString(" ") // drop 3 of 80 words
    val rows = Seq(
      (1L, base), (2L, near), (3L, doc(2, 80)), (4L, doc(3, 80)))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(rows, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup must be found")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), "unrelated doc must not pair")
  }

  test("minhash signature similarity approximates true Jaccard") {
    val base = doc(5, 100)
    val near = base.split(" ").drop(5).mkString(" ")
    val df = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("grams", graft.functions.TextFns.wordNgrams(col("w"), 3))
      .withColumn("sig", DedupOps.minhashSignature(col("grams"), 64))
    val Array(a, b) = df.orderBy("doc_id").select("sig", "grams").collect()
    val sigA = a.getSeq[Int](0); val sigB = b.getSeq[Int](0)
    val gA = a.getSeq[String](1).toSet; val gB = b.getSeq[String](1).toSet
    val est = sigA.zip(sigB).count(p => p._1 == p._2).toDouble / 64
    val truth = gA.intersect(gB).size.toDouble / gA.union(gB).size
    assert(math.abs(est - truth) < 0.25, s"minhash est $est vs true $truth")
  }

  test("simhashPairs finds small mutations via pigeonhole blocks") {
    val base = doc(7, 80)
    val mutated = {
      val w = base.split(" "); w(10) = "changedword"; w.mkString(" ")
    }
    val rows = Seq(
      (1L, base), (2L, mutated), (3L, doc(8, 80)))
      .toDF("doc_id", "text")
    val pairs = DedupOps.simhashPairs(rows, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "one-word mutation should stay within hamming budget")
  }

  test("minhash boilerplate guard drops oversized buckets but keeps real dups") {
    // 30 docs sharing one boilerplate text (a degenerate bucket of 30) plus
    // one genuine near-dup pair of a distinct doc.
    val boiler = (0 until 30).map(i => (100L + i, doc(99, 80)))
    val base = doc(42, 80)
    val near = base.split(" ").drop(2).mkString(" ")
    val rows = (boiler ++ Seq((1L, base), (2L, near))).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(rows, tau = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "genuine near-dup must survive the guard")
    assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L),
      "boilerplate bucket (30 > maxBucket) must be dropped")
  }

  test("identical docs have identical simhash (hamming 0)") {
    val rows = Seq((1L, doc(9)), (2L, doc(9))).toDF("doc_id", "text")
    val got = DedupOps.simhashPairs(rows, maxHamming = 0).collect()
    assert(got.length === 1 && got(0).getAs[Long]("hamming") === 0L)
  }
}
