package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * The 100 TB contract (SURVEY §3): candidate generation is always a single
  * shuffle on a blocking key (content hash / LSH band-bucket / SimHash block /
  * label block) and verification happens only within candidate groups —
  * never an all-pairs cross join. AQE skew-join handles pathological buckets
  * (e.g. a boilerplate shingle that lands millions of docs in one band).
  */
object DedupOps {

  // -------------------------------------------------------------- dedup_exact

  /** Exact dedup: md5 of whitespace/case-normalized text, keep the smallest
    * id per hash group. One shuffle on the hash. Every row keeps its verdict
    * (keep_id, is_dup) so downstream filters are a cheap projection.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(lower(trim(col(textCol))))
    val byHash = Window.partitionBy("content_hash")
    docs
      .withColumn("content_hash", h)
      .withColumn("keep_id", min(col(idCol)).over(byHash))
      .withColumn("is_dup", col(idCol) =!= col("keep_id"))
  }

  /** Planted-duplicate corpus shared by the text-dedup wrappers: the base
    * documents plus exact copies (id+1000000, trailing whitespace — exercises
    * normalization) of every 7th doc, plus near-copies (id+2000000, first 5
    * words dropped) of every 9th doc.
    */
  def plantedCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "lang", "source", "text")
    val exact = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("lang"), col("source"),
        concat(col("text"), lit(" ")).as("text"))
    val near = base.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"), col("lang"), col("source"),
        array_join(slice(spaceTokens(col("text")), 6, 100000), " ").as("text"))
    base.unionByName(exact).unionByName(near)
  }

  def qDedupExact(s: SparkSession, d: String): DataFrame =
    dedupExact(plantedCorpus(s, d), "doc_id", "text")
      .select("doc_id", "content_hash", "keep_id", "is_dup")
      .orderBy("doc_id")

  // ------------------------------------------------------------ ngram_jaccard

  /** Word-3-gram Jaccard pairs ≥ τ within (lang, source) blocks. The block
    * key bounds the self-join: one shuffle on the block key, pairs verified
    * inside each block. At 100 TB the block key would be an LSH bucket
    * (see `minhashPairs`) — this operator is the exact-verification core.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double, blockCols: Seq[String]): DataFrame = {
    val grams = docs
      .withColumn("w", spaceTokens(col("text")))
      .filter(size(col("w")) >= n)
      .withColumn("grams", wordNgrams(col("w"), n))
      .select((Seq("doc_id", "grams") ++ blockCols).map(col): _*)
    val a = grams.select(
      (col("doc_id").as("id1") +: col("grams").as("g1") +: blockCols.map(col)): _*)
    val b = grams.select(
      (col("doc_id").as("id2") +: col("grams").as("g2") +: blockCols.map(col)): _*)
    val inter = size(array_intersect(col("g1"), col("g2")))
    val jac = inter / (size(col("g1")) + size(col("g2")) - inter).cast("double")
    a.join(b, blockCols, "inner")
      .filter(col("id1") < col("id2"))
      .withColumn("jaccard", round(jac, 6))
      .filter(col("jaccard") >= tau)
      .select("id1", "id2", "jaccard")
  }

  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(plantedCorpus(s, d), n = 3, tau = 0.4, blockCols = Seq("lang", "source"))
      .orderBy("id1", "id2")

  // ------------------------------------------------------------- dedup_minhash

  /** MinHash signatures: sig[i] = min over shingles of murmur3(shingle, i).
    * One array traversal per hash function, all codegen'd expression trees.
    */
  def minhashSignature(grams: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(grams, g => hash(g, lit(i))))): _*)

  /** MinHash + LSH banding near-dup pairs:
    * shingle → `numHashes` minhashes → `bands` bands of `numHashes/bands`
    * rows → explode to (band, band_hash) keys → self-join on the band key
    * (THE one shuffle) → distinct candidate pairs → verify exact Jaccard ≥
    * τ on the shingle sets. Candidate volume is linear in docs × bands, not
    * quadratic — the scale path for text near-dup at 100 TB.
    */
  def minhashPairs(
      docs: DataFrame,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      tau: Double = 0.4): DataFrame = {
    val rows = numHashes / bands
    val grams = docs
      .withColumn("w", spaceTokens(col("text")))
      .filter(size(col("w")) >= n)
      .withColumn("grams", wordNgrams(col("w"), n))
      .select("doc_id", "grams")
    val sig = grams.withColumn("sig", minhashSignature(col("grams"), numHashes))
    val banded = sig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        hash(b +: (0 until rows).map(r => element_at(col("sig"), b * lit(rows) + r + 1)): _*)))
        .as(Seq("band", "band_hash")))
    val cand = banded.as("x")
      .join(banded.as("y"), Seq("band", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val g1 = grams.select(col("doc_id").as("id1"), col("grams").as("g1"))
    val g2 = grams.select(col("doc_id").as("id2"), col("grams").as("g2"))
    val inter = size(array_intersect(col("g1"), col("g2")))
    val jac = inter / (size(col("g1")) + size(col("g2")) - inter).cast("double")
    cand
      .join(g1, "id1")
      .join(g2, "id2")
      .withColumn("jaccard", round(jac, 6))
      .filter(col("jaccard") >= tau)
      .select("id1", "id2", "jaccard")
  }

  def qDedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashPairs(plantedCorpus(s, d)).orderBy("id1", "id2")

  // ------------------------------------------------------------- dedup_simhash

  /** 64-bit SimHash: bit b is the sign of Σ_tokens (±1 by bit b of
    * xxhash64(token)). Computed as one expression tree over the token array
    * (64 in-partition folds — at 100 TB this is the spot a custom codegen'd
    * `Expression` would take over; semantics identical).
    */
  def simhash64(tokens: Column): Column =
    (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      val bitSum = aggregate(
        tokens,
        lit(0L),
        (s, t) => s + when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      acc.bitwiseOR(when(bitSum >= 0, lit(1L << b)).otherwise(0L))
    }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, candidates
    * via the 4×16-bit pigeonhole: distance ≤ 3 ⟹ at least one of the four
    * 16-bit blocks is equal, so candidate generation is 4 narrow equi-joins
    * (one shuffle on (block, value)) instead of all-pairs.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = docs
      .withColumn("w", spaceTokens(col("text")))
      .filter(size(col("w")) >= 1)
      .withColumn("simhash", simhash64(col("w")))
      .select("doc_id", "simhash")
    val blocked = sh.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("block", "block_val")))
    val cand = blocked.as("x")
      .join(blocked.as("y"), Seq("block", "block_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        col("x.simhash").as("sh1"), col("y.simhash").as("sh2"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  def qDedupSimhash(s: SparkSession, d: String): DataFrame =
    simhashPairs(plantedCorpus(s, d)).orderBy("id1", "id2")

  // ---------------------------------------------------------- dedup_embedding

  /** Embedding corpus with planted near-duplicates: every 11th vector is
    * re-added (id+100000) scaled by 1.01 — cosine ≈ 1, so thresholding must
    * recover exactly these pairs plus any natural near-dups.
    */
  def plantedEmbeddings(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val mut = base.filter(col("vec_id") % 11 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        transform(col("v"), x => x * 1.01).as("v"))
    base.unionByName(mut)
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine near-dup pairs ≥ τ within `label` blocks (blocked cross join —
    * the exact small-scale baseline; `AnnOps.lshTopK` is the 100 TB path
    * where blocks come from random-hyperplane buckets instead of labels).
    */
  def embeddingPairs(vecs: DataFrame, tau: Double): DataFrame = {
    val normed = vecs.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val a = normed.select(col("label"), col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = normed.select(col("label"), col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos_sim", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
      .filter(col("cos_sim") >= tau)
      .select("id1", "id2", "cos_sim")
  }

  def qDedupEmbedding(s: SparkSession, d: String): DataFrame =
    embeddingPairs(plantedEmbeddings(s, d), tau = 0.95).orderBy("id1", "id2")
}
