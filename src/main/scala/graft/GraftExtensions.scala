package graft

import graft.functions.{BloomMightContain, CosineSim, CountTokenRun, DotProduct, WinnowFingerprints, WordNgrams}
import org.apache.spark.sql.catalyst.expressions.CreateArray
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works the
  * same as the Scala DSL (`VectorFns.cosine_sim`).
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit —
  * the latter is how a cluster rollout ships the library without code
  * changes in consumer jobs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams",
        "word_ngrams(tokens, n) - distinct '_'-joined word n-grams of an array<string>"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(n: Int, _) => WordNgrams(args(0), n)
        case _ => throw new IllegalArgumentException(
          "word_ngrams: n must be an integer literal (the gram width is part of the plan)")
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - winnowing fingerprint minima of k-char grams over windows of w"),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (Literal(k: Int, _), Literal(w: Int, _)) => WinnowFingerprints(args(0), k, w)
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints: k and w must be integer literals (they are part of the plan)")
      }))
    ext.injectFunction((
      FunctionIdentifier("count_token_run"),
      info("count_token_run",
        "count_token_run(tokens, array('a','b')) - occurrences of the consecutive token run (overlaps counted)"),
      (args: Seq[Expression]) => args(1) match {
        case CreateArray(elems, _) if elems.nonEmpty && elems.forall {
          case Literal(v, t) => v != null && t == org.apache.spark.sql.types.StringType
          case _ => false
        } =>
          CountTokenRun(args(0), elems.map(_.asInstanceOf[Literal].value.toString))
        case _ => throw new IllegalArgumentException(
          "count_token_run: the phrase must be a non-empty array of string literals (it is part of the plan)")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(hash, bloom) - probe a graft bloom binary with a bigint hash (false = definitely absent)"),
      (args: Seq[Expression]) => BloomMightContain(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      info("bloom_build",
        "bloom_build(hash, numBits, numHashes) - aggregate bigint hashes into a graft bloom binary"),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (Literal(bits: Int, _), Literal(k: Int, _)) =>
          graft.functions.BloomBuildAgg(args(0), bits.toLong, k)
        case (Literal(bits: Long, _), Literal(k: Int, _)) =>
          graft.functions.BloomBuildAgg(args(0), bits, k)
        case _ => throw new IllegalArgumentException(
          "bloom_build: numBits and numHashes must be integer literals (they size the plan)")
      }))
    ext.injectFunction((
      FunctionIdentifier("glob_regex"),
      info("glob_regex",
        "glob_regex(pattern) - robots-rule fnmatch glob to Java regex (trailing $ = exact, implied trailing *)"),
      (args: Seq[Expression]) => graft.functions.GlobRegex(args(0))))
    ext.injectFunction((
      FunctionIdentifier("warc_parse"),
      info("warc_parse",
        "warc_parse(bytes) - WARC file bytes to an array of record structs (Content-Length-exact framing)"),
      (args: Seq[Expression]) => graft.functions.WarcParse(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gunzip"),
      info("gunzip",
        "gunzip(bytes) - decompress (multi-member) gzip binary, e.g. a .warc.gz file"),
      (args: Seq[Expression]) => graft.functions.Gunzip(args(0))))
  }
}
