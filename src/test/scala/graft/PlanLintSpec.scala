package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Fleet-wide plan lint: no declared query may plan a
 * `CartesianProductExec` — the both-sides-big, no-broadcast product that
 * cannot survive a 100 TB corpus. Everything that multiplies relations
 * must ride a broadcast (model/centroid/stats/query-batch tables), which
 * plans as BroadcastNestedLoopJoin, not CartesianProduct — including the
 * declared brute-force baseline `sim_topk_join`, whose bounded query
 * batch broadcasts against the streamed corpus.
 *
 * Catches the regression class where a broadcast hint is lost (a model
 * table grows a lineage Spark won't auto-broadcast, a config flips) and
 * a scale path silently degrades to an all-pairs shuffle.
 */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** No exceptions needed: even the declared brute-force baseline
    * (`sim_topk_join`, Similarity.topKJoin's corpus crossJoin) rides a
    * BroadcastNestedLoopJoin because its query side is a bounded batch —
    * the honest 100 TB shape (corpus streamed against broadcast queries).
    * CartesianProductExec appears only when NEITHER side broadcasts,
    * which is exactly the defect class this lint exists to catch. */
  private val bruteForceBaselines = Set.empty[String]

  test("positive control: the lint's probe does detect a planned cartesian") {
    import org.apache.spark.sql.functions.col
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(100).select(col("id").as("x"))
      val b = spark.range(100).select(col("id").as("y"))
      assert(a.crossJoin(b).queryExecution.executedPlan.toString
        .contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  /** The per-query top-k election in the batch k-NN join family rides the
    * `struct_topk` heap aggregate, not a rank window: zero Window nodes in
    * any plan of the family (the window idiom would drag a full
    * per-partition sort of the scored relation in front of the exchange),
    * and the pure brute-force baseline plans zero Sort nodes of any kind —
    * its only exchange is the ≤ k-rows-per-query heap aggregation. */
  test("sim_topk_join family elects top-k via heap aggregation, not a window") {
    val sfDir = "/root/testdata/sf0.001"
    val family = SparkEntry.queries.keys.filter(_.startsWith("sim_topk_join")).toSeq.sorted
    assert(family.nonEmpty)
    for (name <- family) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plans a Window node — the heap election regressed:\n$plan")
      assert(plan.contains("struct_topk"), s"$name does not plan struct_topk")
    }
    val brute = SparkEntry.queries("sim_topk_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!brute.contains("Sort"),
      s"sim_topk_join plans a Sort node:\n$brute")
  }

  test("no declared query plans a CartesianProductExec") {
    val sfDir = "/root/testdata/sf0.001"
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries if !bruteForceBaselines(name)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) violations += name
      } catch {
        case scala.util.control.NonFatal(e) =>
          errors += s"$name: ${e.getMessage}"
      }
    }
    assert(errors.isEmpty, s"queries failed to plan at sf0.001:\n${errors.mkString("\n")}")
    assert(violations.isEmpty,
      s"CartesianProductExec planned by: ${violations.mkString(", ")}")
  }
}
