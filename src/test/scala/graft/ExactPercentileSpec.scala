package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** r20 optimization guard: the sort-based `value_quantiles` rewrite must
  * compute the IDENTICAL values as the `percentile(...)` buffer aggregate
  * it replaced (Spark's interpolation at rank p·(n−1)) — on random data,
  * including the n = 1 and exact-integer-rank edges, at full double
  * precision BEFORE the declared 4dp quantization. */
class ExactPercentileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sort-based exact percentiles == percentile() on random groups") {
    val rnd = new scala.util.Random(7)
    // group sizes 1, 2, 21 (0.95·(n−1) integral), and a large ragged one
    val rows =
      Seq.tabulate(1)(i => ("A", rnd.nextDouble() * 1000)) ++
      Seq.tabulate(2)(i => ("B", rnd.nextDouble() * 1000)) ++
      Seq.tabulate(21)(i => ("C", rnd.nextDouble() * 1000)) ++
      Seq.tabulate(997)(i => ("D", rnd.nextDouble() * 1000))
    val dir = java.nio.file.Files.createTempDirectory("graft_pctl").toString
    rnd.shuffle(rows).toDF("l_returnflag", "l_extendedprice")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("value_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ps"))
      .select(col("l_returnflag"),
        graft.functions.Quantize.quantize(col("ps").getItem(0), 4).as("p50"),
        graft.functions.Quantize.quantize(col("ps").getItem(1), 4).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    for (k <- want.keySet) {
      assert(java.lang.Double.doubleToLongBits(got(k)._1) ==
        java.lang.Double.doubleToLongBits(want(k)._1), s"p50 group $k")
      assert(java.lang.Double.doubleToLongBits(got(k)._2) ==
        java.lang.Double.doubleToLongBits(want(k)._2), s"p95 group $k")
    }
  }
}
