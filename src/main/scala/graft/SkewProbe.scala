package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-stress standing probe: times the two documented worst-case
  * designs on DEGENERATE inputs and writes SKEW.json, turning the
  * plan-audit claims ("the host tournament bounds a pathological host",
  * "maxBucket sheds a degenerate shingle cluster") into per-round
  * trended measurements.
  *
  *  - mega-host frontier: every URL of an amplified corpus lands on ONE
  *    host (amplification × the corpus), through `frontierSchedule`'s
  *    two-level tournament with the same maxPerHost=400 cap the gate
  *    query uses. Without the tournament this is one spilling
  *    whole-host sort task; with it, level 1 bounds every sort at
  *    ~1/32 of the host and level 2 sees ≤ 32×400 rows.
  *  - degenerate shingles: every document is the same "the the the …"
  *    text, so all minhash band buckets collapse onto single hot keys
  *    that exceed maxBucket=1000 and must be SHED, not exploded into
  *    O(n²) in-bucket pairs.
  *
  * Both probes also run a healthy-input baseline (the gate fixtures) so
  * the record carries a skew/healthy wall ratio — the number that should
  * stay O(1) across rounds. Pairs expected: 0 for the degenerate corpus
  * (everything shed), scheduling rows = min(corpus, 400) for mega-host.
  */
object SkewProbe {
  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val amplify = sys.env.get("SPARK_GRAFT_SKEW_AMPLIFY").map(_.toInt).getOrElse(50)
    val spark: SparkSession = GraftSession.get("graft-skew-probe")

    val docs = Tables.documents(spark, sfDir)

    // -- frontier: healthy baseline (gate fixture — hosts = sources) ----
    def frontierHealthy(): DataFrame = operators.SyncOps.qFrontierSchedule(spark, sfDir)
    // warmup once so codegen/scan setup is not attributed to the baseline
    frontierHealthy().count()
    val (tFrontierBase, nFrontierBase) = time(frontierHealthy().count())

    // -- frontier: mega-host — amplified corpus, ONE host ---------------
    val mega = docs
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(amplify - 1))).as("rep"))
      .select(
        concat(lit("https://mega.eu/d/"), col("doc_id"), lit("/"), col("rep"))
          .as("url"),
        lit("mega.eu").as("host"),
        (col("n_chars") + col("rep")).as("priority"))
    def frontierMega() = operators.SyncOps.frontierSchedule(mega, "host",
      "priority", slotsPerWave = 3, maxPerHost = 400L)
    // warm the skew plan too: both sides of every ratio must exclude the
    // one-time codegen/scan setup, or the trended ratio carries a
    // round-varying constant
    frontierMega().count()
    val (tFrontierMega, nFrontierMega) = time(frontierMega().count())

    // -- minhash: healthy baseline (real corpus text) -------------------
    val healthyDocs = docs.select(col("doc_id"), col("text"))
    operators.DedupOps.minhashPairs(healthyDocs).count()
    val (tMinhashBase, nMinhashBase) = time(
      operators.DedupOps.minhashPairs(healthyDocs).count())

    // -- minhash: degenerate shingles — identical text corpus-wide ------
    val degenerate = docs.select(col("doc_id"),
      concat(lit(("the " * 60).trim), lit(" tail"), col("doc_id") % 2).as("text"))
    operators.DedupOps.minhashPairs(degenerate).count()
    val (tMinhashDegen, nMinhashDegen) = time(
      operators.DedupOps.minhashPairs(degenerate).count())

    def fnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // derivable — no extra corpus-sized job just for a record field
    val megaRows = docs.count() * amplify
    val record =
      s"""{"sf":"$sfDir","amplify":$amplify,"mega_rows":$megaRows,""" +
      s""""frontier_healthy_sec":${fnum(tFrontierBase)},"frontier_healthy_rows":$nFrontierBase,""" +
      s""""frontier_mega_sec":${fnum(tFrontierMega)},"frontier_mega_rows":$nFrontierMega,""" +
      s""""frontier_ratio":${fnum(if (tFrontierBase > 0) tFrontierMega / tFrontierBase else -1.0)},""" +
      s""""minhash_healthy_sec":${fnum(tMinhashBase)},"minhash_healthy_pairs":$nMinhashBase,""" +
      s""""minhash_degen_sec":${fnum(tMinhashDegen)},"minhash_degen_pairs":$nMinhashDegen,""" +
      s""""minhash_ratio":${fnum(if (tMinhashBase > 0) tMinhashDegen / tMinhashBase else -1.0)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SKEW.json"), record.getBytes("UTF-8"))
    System.err.flush()
    println(record)
    spark.stop()
  }
}
