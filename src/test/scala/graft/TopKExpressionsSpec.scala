package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.TopKExpressions

class TopKExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("struct_topk keeps the k smallest structs, sorted, across partitions") {
    // 4 partitions force partial buffers through serialize/merge
    val df = spark.range(0, 1000, 1, 4)
      .select((col("id") % 7).as("key"), col("id"),
        ((col("id") * 37) % 1000).as("v"))
    val got = df.groupBy(col("key"))
      .agg(TopKExpressions.topKStructs(struct(col("v"), col("id")), 3).as("t"))
      .select(col("key"), col("t"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    // oracle: plain Scala
    val want = (0L until 1000L).map(id => ((id % 7), ((id * 37) % 1000, id)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.take(3) }
    assert(got.keySet == want.keySet)
    for (k <- want.keys) assert(got(k) == want(k), s"key $k")
  }

  test("struct_topk: fewer rows than k, null structs ignored, negation gives descending") {
    val df = Seq(
      (1L, Some(5.0), 10L), (1L, Some(9.0), 11L), (1L, None, 12L),
      (2L, Some(3.0), 20L))
      .toDF("key", "price", "id")
    val sel = when(col("price").isNotNull, struct((-col("price")).as("np"), col("id")))
    val got = df.groupBy(col("key"))
      .agg(TopKExpressions.topKStructs(sel, 3).as("t"))
      .select(col("key"), col("t")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (-x.getDouble(0), x.getLong(1))))
      .toMap
    assert(got(1L) == Seq((9.0, 11L), (5.0, 10L))) // desc by price, null row ignored
    assert(got(2L) == Seq((3.0, 20L)))
  }

  test("struct_topk rejects unorderable struct fields at analysis time") {
    // a map field passed analysis and blew up in getInterpretedOrdering
    // mid-task; native sort/agg convention is RowOrdering.isOrderable in
    // checkInputDataTypes
    val df = Seq((1L, 2L)).toDF("a", "b")
      .select(col("a"), map(col("a"), col("b")).as("m"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(TopKExpressions.topKStructs(struct(col("a"), col("m")), 2)).collect()
    }
  }

  test("top_parts_heap reproduces window_top_parts exactly at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("window_top_parts")(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("top_parts_heap")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a == b, s"window rows ${a.size} vs heap rows ${b.size}")
    // and the heap plan contains no full-input Sort before the aggregate
    val plan = SparkEntry.queries("top_parts_heap")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based plan:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), "heap form must not plan a window")
  }
}
