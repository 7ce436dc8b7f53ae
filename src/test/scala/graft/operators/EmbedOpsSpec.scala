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

  test("semantic_search ranks the doc containing the exact query passage first") {
    val spark2 = spark
    import spark2.implicits._
    val query = "climate adaptation measures for coastal regions"
    val docs = Seq(
      (1L, "completely unrelated text about databases and joins and shuffles"),
      (2L, query), // single passage == query text → cosine 1.0
      (3L, "climate adaptation measures for inland lakes and rivers today")
    ).toDF("doc_id", "text")
    val got = EmbedOps.semanticSearchTopK(docs, query, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 === 2L, "exact-passage doc must rank first")
    assert(got.head._2 === 1.0, "identical text ⇒ identical stub vector ⇒ cos 1")
    assert(got.length === 3)
  }

  test("semantic_search query vector is constant-folded (no join on the query side)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = EmbedOps.semanticSearchTopK(docs, "q", k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("pluggable Encoder: a fake external encoder drives the attach unchanged") {
    val passages = Seq(
      (1L, 0L, "alpha beta gamma"),
      (2L, 0L, "alpha beta gamma"),
      (3L, 0L, "delta eps zeta"),
      (3L, 1L, "eta theta iota"))
      .toDF("doc_id", "passage_id", "passage")
    // a "remote model": vector = [len, first-char code] — clearly not the
    // stub, deterministic, and verifiable per text
    val fake = new Encoder {
      val dim = 2
      def encode(batch: Seq[String]): Seq[Array[Float]] =
        batch.map(t => Array(t.length.toFloat, t.head.toFloat))
    }
    val encoded = EmbedOps.encodeDistinctWith(passages, "passage", fake, batchSize = 2)
    assert(encoded.count() === 3L, "distinct texts encode once")
    val attached = EmbedOps.attachEmbeddings(passages, encoded, "passage")
    assert(attached.count() === 4L, "attach keeps every passage row")
    attached.collect().foreach { r =>
      val t = r.getAs[String]("passage")
      val v = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(v == Seq(t.length.toFloat, t.head.toFloat),
        s"'$t' must carry ITS vector — attach keyed exactly like the stub path")
    }
  }

  test("encoder batches are bounded by batchSize and texts arrive in order") {
    val texts = (0 until 23).map(i => (i.toLong, 0L, s"text number $i"))
      .toDF("doc_id", "passage_id", "passage")
    val counting = new Encoder {
      val dim = 1
      def encode(batch: Seq[String]): Seq[Array[Float]] = {
        require(batch.nonEmpty && batch.length <= 7, s"batch of ${batch.length}")
        batch.map(_ => Array(1f))
      }
    }
    val n = EmbedOps.encodeDistinctWith(texts, "passage", counting, batchSize = 7).count()
    assert(n === 23L)
  }

  test("Encoder.stub reproduces the stubEmbedding column formula bit for bit") {
    val texts = Seq("alpha beta gamma", "delta eps zeta", "äëïöü non-ascii")
    val viaColumn = texts.toDF("t")
      .select(EmbedOps.stubEmbedding(col("t"), 8).as("v"))
      .collect().map(_.getSeq[Double](0).toSeq)
    val viaEncoder = Encoder.stub(8).encode(texts).map(_.toSeq.map(_.toDouble))
    // the encoder casts to float at the boundary; the double formula
    // underneath is identical, so the float is the EXACT rounding of the
    // column value
    viaColumn.zip(viaEncoder).foreach { case (c, e) =>
      assert(c.map(_.toFloat.toDouble) == e, "same hash, same scale, float-rounded")
    }
  }

  test("semanticSearchTopKWith ranks like the stub path under the stub encoder") {
    val spark2 = spark
    import spark2.implicits._
    val query = "climate adaptation measures for coastal regions"
    val docs = Seq(
      (1L, "completely unrelated text about databases and joins and shuffles"),
      (2L, query),
      (3L, "climate adaptation measures for inland lakes and rivers today")
    ).toDF("doc_id", "text")
    val got = EmbedOps.semanticSearchTopKWith(docs, query, k = 3, Encoder.stub(64))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 === 2L, "exact-passage doc still ranks first")
    assert(got.head._2 === 1.0)
    val stubPath = EmbedOps.semanticSearchTopK(docs, query, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got.map(_._1).toSeq == stubPath, "same model ⇒ same ranking")
  }

  test("a task killed mid-encode retries to exactly-once results over an at-least-once transport") {
    val spark2 = spark
    import spark2.implicits._
    // 40 distinct texts across 2 partitions, batchSize 4 → ~5 encoder
    // calls per task: the marked text sits in a LATER batch of its task,
    // so the first attempt has already encoded earlier batches (real
    // side effects at the service) when it dies. Spark discards the dead
    // attempt's output and reruns the whole task (maxFailures=2 on the
    // shared session) — the service sees those texts AGAIN
    // (at-least-once transport), but the committed result must carry
    // each text exactly once with the stub-exact vector.
    FlakyEncoderState.reset()
    val texts = (0 until 40).map(i => f"retry probe text $i%02d")
    val marker = texts(30)
    val df = texts.toDF("passage").repartition(2)
    val out = EmbedOps.encodeDistinctWith(df, "passage",
      new FlakyEncoder(64, marker), batchSize = 4)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray)

    // exactly-once at the result level: one row per distinct text
    assert(out.length === texts.length)
    assert(out.map(_._1).distinct.length === texts.length, "no duplicate rows from the dead attempt")
    // vectors are the stub's, bit for bit — the retry re-encoded, it
    // didn't corrupt or skip
    val expect = Encoder.stub(64)
    out.foreach { case (t, v) =>
      assert(v.toSeq == expect.encode(Seq(t)).head.toSeq, s"vector mismatch for '$t'")
    }
    // and the transport really was at-least-once: the marker was encoded
    // once by the killed attempt (bumped before the throw) and once by
    // the retry; its task-mates from earlier batches were re-encoded too
    assert(FlakyEncoderState.calls(marker) === 2,
      s"marker encoded ${FlakyEncoderState.calls(marker)}× — kill or retry did not happen")
    assert(FlakyEncoderState.killed.get() === 1, "exactly one attempt was killed")
    val reEncoded = FlakyEncoderState.callCounts.count(_._2 >= 2)
    assert(reEncoded >= 2,
      "the dead attempt's earlier batches were re-encoded on retry (service-side duplicates)")
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

/** JVM-wide side-effect ledger for the task-retry spec: local mode runs
  * executors in the test JVM, so a static object observes every encoder
  * call across task attempts — the "service's" request log.
  */
object FlakyEncoderState {
  import java.util.concurrent.ConcurrentHashMap
  import java.util.concurrent.atomic.AtomicInteger
  private val map = new ConcurrentHashMap[String, AtomicInteger]()
  val killed = new AtomicInteger(0)
  def reset(): Unit = { map.clear(); killed.set(0) }
  def bump(t: String): Unit =
    map.computeIfAbsent(t, _ => new AtomicInteger(0)).incrementAndGet()
  def calls(t: String): Int = Option(map.get(t)).map(_.get).getOrElse(0)
  def callCounts: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    map.asScala.map { case (k, v) => k -> v.get }.toMap
  }
}

/** Delegates to the deterministic stub but kills the FIRST attempt of the
  * task that reaches `marker` — AFTER logging the batch at the service
  * (the crash happens mid-flight, like a real executor loss between the
  * model call and the task commit).
  */
class FlakyEncoder(dimensions: Int, marker: String) extends Encoder {
  private val stub = Encoder.stub(dimensions)
  val dim: Int = dimensions
  def encode(batch: Seq[String]): Seq[Array[Float]] = {
    batch.foreach(FlakyEncoderState.bump)
    if (batch.contains(marker) &&
        org.apache.spark.TaskContext.get().attemptNumber() == 0) {
      FlakyEncoderState.killed.incrementAndGet()
      throw new RuntimeException("simulated executor loss mid-encode")
    }
    stub.encode(batch)
  }
}
