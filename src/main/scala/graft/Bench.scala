package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen compiler, shuffle machinery, parquet
    // reader) so the first measured query doesn't absorb ~4s of JVM init.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Each query runs at least twice and reports the MIN over SUCCESSFUL
    // runs: a one-off GC pause or background compile otherwise poisons a
    // single-shot number (round-1 recorded 14.4s for a query that
    // reproduces at ~1s idle), and a transient failure on run 1 must not
    // discard a valid run-2 measurement. When the two fastest samples
    // still disagree by >40% the query gets up to two more attempts:
    // sample variance IS the busy-box signature (three rounds of recorded
    // 2–4× inflation on untouched code that idle re-runs erased), and
    // min-of-N converges to the idle number precisely when it's needed.
    // Only NonFatal failures are swallowed per attempt — a VM error (OOM,
    // stack overflow) aborts the bench loudly.
    //
    // toRdd.count(), NOT Dataset.count(): counting through a fresh
    // Aggregate lets Catalyst prune the query's own projections, so a
    // pure-projection query (text scoring, redaction, fingerprints) would
    // "benchmark" as a scan+count with none of its expressions evaluated.
    // toRdd executes the query's own optimized plan with every output
    // column materialized — the same work Verify's parquet write measures,
    // and the same work the DuckDB comparator does materializing results.
    var failed = Set.empty[String]
    // queries + declared build steps: training cost stays measured on the
    // ledger even though builds are excluded from the correctness dump
    val results = (SparkEntry.queries ++ SparkEntry.builds).map { case (name, fn) =>
      def attempt(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case scala.util.control.NonFatal(t) =>
          // a failed attempt must be VISIBLE, and its failure-fast elapsed
          // time must not masquerade as a measurement
          System.err.println(s"[bench] $name attempt failed: ${t.getMessage}")
          None
        }
      }
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var n = 0
      def unstable: Boolean = times.size < 2 || {
        val s = times.sorted
        s(1) > s(0) * 1.4
      }
      while (n < 2 || (n < 4 && unstable)) {
        attempt().foreach(times += _)
        n += 1
      }
      if (times.isEmpty) failed += name
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers SUCCESSFUL queries only — failures are listed, not summed
    val total = results.values.filter(_ >= 0).sum
    val errs = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // The driver tail-captures stdout, and the one giant per-query line was
    // truncated two rounds running (BENCH_r05/r06 "parsed": null) — the hard
    // perf signal got lost. So: the full per-query map goes to stderr AND a
    // sidecar file, while stdout's LAST line is a short JSON document that
    // always survives tail capture. n_queries makes the short line
    // self-describing; queries_file points at the full breakdown.
    val qFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES_FILE",
      "/root/repo/BENCH_QUERIES.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(qFile),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(t) =>
      System.err.println(s"[bench] could not write $qFile: ${t.getMessage}")
    }
    System.err.println(fullJson)
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""n_queries":${results.size},"errors":$errs,"sf":"$sfDir",""" +
      s""""queries_file":"$qFile"}""")
    spark.stop()
  }
}
