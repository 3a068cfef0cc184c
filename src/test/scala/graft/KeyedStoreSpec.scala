package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{KeyedStore, Reshape}
import graft.sources.WideMatrix

class KeyedStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val keys = Fixtures.F1Spec.keyFields

  private lazy val incoming: DataFrame = Reshape.pipeline(
    WideMatrix.valuesWide(WideMatrix.readCsv(spark, Fixtures.F1Csv), Fixtures.F1Spec),
    Fixtures.F1Spec)
  private lazy val existing: DataFrame = Fixtures.store(spark)

  test("classify: create / replace / unchanged exactly as the reference probe") {
    val byStation = KeyedStore.classify(incoming, existing, keys)
      .collect().map(r => (r.getAs[String]("station_id"), r.getAs[String]("date")) ->
        r.getAs[String]("action")).toMap
    assert(byStation(("39.2", "2022-03-01")) == "unchanged") // identical value -> skip
    assert(byStation(("39.2", "2022-03-02")) == "replace") // stored 99.9 != 16.8
    assert(byStation(("147.0", "2022-03-01")) == "create") // no match
  }

  test("replace=false: matched rows never classified replace") {
    val actions = KeyedStore.classify(incoming, existing, keys, replace = false)
      .select("action").collect().map(_.getString(0)).toSet
    assert(actions == Set("create", "unchanged"))
  }

  test("stats conservation: created + replaced + unchanged == |increment|") {
    val st = KeyedStore.stats(KeyedStore.classify(incoming, existing, keys))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.values.sum == incoming.count())
    assert(st == Map("create" -> 1L, "replace" -> 1L, "unchanged" -> 1L))
  }

  test("merge: post-state has replaced payload, new uuid for creates, bystander kept") {
    val merged = KeyedStore.merge(incoming, existing, keys)
    val rows = merged.collect().map(r => r.getAs[String]("station_id") ->
      (r.getAs[String]("date"), r.getAs[Double]("value"), r.getAs[String]("uuid")))
    assert(rows.length == 4)
    val m = rows.groupBy(_._1)
    assert(m("39.2").map(_._2).toSet ==
      Set(("2022-03-01", 17.2, "u-0001"), ("2022-03-02", 16.8, "u-0002"))) // replace keeps uuid
    assert(m("500.1").head._2 == ("2022-03-01", 5.0, "u-0003")) // untouched bystander
    val created = m("147.0").head._2
    assert(created._3 == "12b129c19f619fa6ca7e14a305be7293") // md5 of \u0001-joined key
  }

  test("merge idempotency: merge(merge(T, inc), inc) == merge(T, inc)") {
    val m1 = KeyedStore.merge(incoming, existing, keys)
    val m2 = KeyedStore.merge(incoming, m1, keys)
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
  }

  test("merge with replace=false keeps existing payloads") {
    val merged = KeyedStore.merge(incoming, existing, keys, replace = false)
    val v = merged.filter(col("station_id") === "39.2" && col("date") === "2022-03-02")
      .head().getAs[Double]("value")
    assert(v == 99.9) // not overwritten
  }

  test("dedupIncrement: within-increment key dupes resolve deterministically") {
    import spark.implicits._
    val dup = Seq(
      ("temperature", "day", "2022-03-01", "raw", "39.2", "min", 1.0),
      ("temperature", "day", "2022-03-01", "raw", "39.2", "min", 2.0))
      .toDF("datatype", "period", "date", "fill", "station_id", "aggregation", "value")
    val out = KeyedStore.dedupIncrement(dup, keys).collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 2.0) // payload desc order
  }

  test("null key fields merge null-safely: no re-create on re-run") {
    import spark.implicits._
    val inc = Seq(("m", null.asInstanceOf[String], 1.0), ("m", "k2", 2.0))
      .toDF("datatype", "station_id", "value")
    val empty = Seq.empty[(String, String, Double, String)]
      .toDF("datatype", "station_id", "value", "uuid")
    val ks = Seq("datatype", "station_id")
    val m1 = KeyedStore.merge(inc, empty, ks)
    assert(m1.count() == 2)
    // the null-key row must MATCH itself on the second merge, not duplicate
    val m2 = KeyedStore.merge(inc, m1, ks)
    assert(m2.count() == 2)
    val acts = KeyedStore.classify(inc, m1, ks).select("action")
      .collect().map(_.getString(0)).toSeq
    assert(acts == Seq("unchanged", "unchanged"))
    // distinct null patterns get distinct uuids
    assert(m1.select("uuid").distinct().count() == 2)
  }

  test("uniqueness violations: duplicated key flagged with its count") {
    val v = KeyedStore.uniquenessViolations(Fixtures.storeDup(spark), keys).collect()
    assert(v.length == 1)
    assert(v.head.getAs[String]("station_id") == "39.2" && v.head.getAs[Long]("n") == 2L)
  }

  test("pruneExisting narrows the store to the increment envelope") {
    val pruned = KeyedStore.pruneExisting(existing, incoming, Seq("datatype", "period", "fill"))
    assert(pruned.count() == existing.count()) // same slice here
    import spark.implicits._
    val otherInc = incoming.withColumn("datatype", lit("rainfall"))
    assert(KeyedStore.pruneExisting(existing, otherInc, Seq("datatype")).count() == 0)
  }

  test("pruneExisting: null statics and null dates stay in the slice (null-safe pruning)") {
    import spark.implicits._
    val ex = Seq(("a", "2022-01-01", 1), (null, "2022-01-02", 2),
      ("a", null, 3), (null, null, 4), ("b", "2022-01-01", 5))
      .toDF("fill", "date", "v")
    // increment carries fill=null and a null date: the matching existing
    // rows must survive pruning or the merge re-creates their keys
    val incNull = Seq((null.asInstanceOf[String], "2022-01-02", 20),
      ("a", null.asInstanceOf[String], 30)).toDF("fill", "date", "v")
    val kept = KeyedStore.pruneExisting(ex, incNull, Seq("fill")).collect()
      .map(_.getAs[Int]("v")).toSet
    // the envelope is CONJUNCTIVE (static-set ∧ date-range, each
    // independently null-admitting), so (null,null) also stays — an
    // over-approximation is sound; dropping a null-keyed match is not
    assert(kept == Set(2, 3, 4), s"got $kept")
    // empty staticKeys = date-bounds-only pruning (used to throw on
    // the inner empty reduce)
    val dateOnly = KeyedStore.pruneExisting(ex,
      Seq(("x", "2022-01-01", 0)).toDF("fill", "date", "v"), Seq.empty).collect()
      .map(_.getAs[Int]("v")).toSet
    assert(dateOnly == Set(1, 5))
  }

  test("dedupIncrement: key-only increment dedups via distinct, no unordered window") {
    import spark.implicits._
    val keyOnly = Seq(("s1", "d1"), ("s1", "d1"), ("s2", "d1"))
      .toDF("station_id", "date")
    val out = KeyedStore.dedupIncrement(keyOnly, Seq("station_id", "date")).collect()
    assert(out.length == 2)
  }

  test("mergeIntoTable rejects a partition column outside the key (slice soundness)") {
    import spark.implicits._
    val inc = Seq(("s1", "2022-01-01", 1.0)).toDF("station_id", "date", "value")
    val e = intercept[IllegalArgumentException](
      KeyedStore.mergeIntoTable(inc, "/tmp/graft_nokey_store", Seq("station_id"),
        partitionCol = Some("date")))
    assert(e.getMessage.contains("must be one of keyCols"))
  }

  test("pagination: page semantics (offset is a page index), deterministic order") {
    import spark.implicits._
    val df = (1 to 25).map(i => (f"k$i%03d", i)).toDF("k", "v")
    val page2 = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 1).collect()
    assert(page2.map(_.getString(0)).toSeq == (11 to 20).map(i => f"k$i%03d"))
    val lastPage = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 2).collect()
    assert(lastPage.length == 5)
  }

  test("point lookup and equality-filter query") {
    assert(KeyedStore.pointLookup(existing, "u-0002").count() == 1)
    assert(KeyedStore.queryFilter(existing,
      Map("datatype" -> "temperature", "station_id" -> "39.2")).count() == 2)
  }

  test("queryFilter: dotted paths resolve struct fields; flat dotted names win") {
    // document-envelope shape: {name, value: {station_id, datatype, ...}}
    val env = existing.select(col("uuid"),
      struct(existing.columns.filterNot(_ == "uuid").map(col): _*).as("value"))
    val hits = KeyedStore.queryFilter(env,
      Map("value.station_id" -> "39.2", "value.datatype" -> "temperature"))
    assert(hits.count() == 2)
    // a FLAT column whose name contains dots is NOT treated as a path
    val flatDotted = existing.withColumnRenamed("station_id", "station.id")
    assert(KeyedStore.queryFilter(flatDotted, Map("station.id" -> "39.2")).count() == 2)
  }

  test("strictKeys: probing a duplicated store key raises RecordKeyException") {
    val dupStore = Fixtures.storeDup(spark)
    val e = intercept[Exception] {
      KeyedStore.classify(incoming, dupStore, keys).collect()
    }
    assert(e.getMessage.contains("RecordKeyException"))
    val e2 = intercept[Exception] {
      KeyedStore.merge(incoming, dupStore, keys).collect()
    }
    assert(e2.getMessage.contains("RecordKeyException"))
    // lax mode reproduces round-1 fan-out behavior on request
    assert(KeyedStore.classify(incoming, dupStore, keys, strictKeys = false)
      .count() > incoming.count())
  }

  test("strictKeys: a duplicated key NOT probed by the increment does not raise") {
    import spark.implicits._
    // duplicate lives on station 999.9 — the increment never touches it
    val dupElsewhere = existing.unionByName(Seq(
      ("temperature", "day", "raw", "999.9", "2022-03-01", 1.0, "min", "u-0100"),
      ("temperature", "day", "raw", "999.9", "2022-03-01", 2.0, "min", "u-0101"))
      .toDF("datatype", "period", "fill", "station_id", "date", "value", "aggregation", "uuid"))
    val acts = KeyedStore.classify(incoming, dupElsewhere, keys)
      .select("action").collect().map(_.getString(0)).toSet
    assert(acts == Set("create", "replace", "unchanged"))
    // merge materializes every joined row, so the bystander dup DOES surface
    // there (full-outer sees it) — but only classify mirrors the reference's
    // probe-scoped check; merge keeps both copies' rows guarded
  }

  test("merge reads the store slice exactly once (single-scan plan)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.FileSourceScanExec
    val store = spark.read.parquet(Fixtures.StoreParquet)
    val merged = KeyedStore.merge(incoming, store, keys)
    merged.collect()
    def countStoreScans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countStoreScans(a.executedPlan)
      case s: QueryStageExec => countStoreScans(s.plan)
      case f: FileSourceScanExec =>
        if (f.relation.location.rootPaths.exists(_.toString.contains("station_store"))) 1 else 0
      case other => other.children.map(countStoreScans).sum
    }
    assert(countStoreScans(merged.queryExecution.executedPlan) == 1)
  }

  test("mergeIntoBucketedTable: layout survives merges; bucket-key join is shuffle-free") {
    import graft.operators.Layout
    spark.sql("DROP TABLE IF EXISTS store_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val st1 = KeyedStore.mergeIntoBucketedTable(existing.drop("uuid"), "store_bucketed",
        keys, bucketCols = Seq("station_id"), nBuckets = 4, partitionCol = Some("date"))
      assert(st1 == KeyedStore.MergeStats(3, 0, 0))
      val st2 = KeyedStore.mergeIntoBucketedTable(incoming, "store_bucketed",
        keys, Seq("station_id"), 4, Some("date"))
      assert(st2 == KeyedStore.MergeStats(1, 1, 1))
      // post-merge content matches the logical merge (uuids are store-side)
      val want = KeyedStore.merge(incoming, existing, keys).drop("uuid")
        .collect().map(_.toSeq).toSet
      val got = spark.table("store_bucketed")
        .select(existing.columns.filterNot(_ == "uuid").map(col): _*)
        .collect().map(_.toSeq).toSet
      assert(got == want)
      // re-running the same increment is a no-op (resume contract)
      val st3 = KeyedStore.mergeIntoBucketedTable(incoming, "store_bucketed",
        keys, Seq("station_id"), 4, Some("date"))
      assert(st3 == KeyedStore.MergeStats(0, 0, 3))
      // the promised layout: a join on the bucket key plans with no exchange
      // EVEN AFTER the insertInto merges (bucket spec preserved end-to-end)
      val t = spark.table("store_bucketed")
      val self = t.as("a").join(t.as("b"), "station_id")
      assert(self.count() > 0)
      assert(Layout.isShuffleFree(self),
        "bucketed store self-join should not shuffle:\n" +
          self.queryExecution.executedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS store_bucketed")
    }
  }

  test("mergeIntoTable with a reliable checkpoint dir: stats and content unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("store_ckpt").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("merge_ckpt").toString
    val seed = Seq(("s1", "2022-03-01", 1.0), ("s2", "2022-03-01", 2.0))
      .toDF("station_id", "date", "value")
    // create path: count observed during the streaming write, no checkpoint
    val st1 = KeyedStore.mergeIntoTable(seed, dir, Seq("station_id", "date"))
    assert(st1 == KeyedStore.MergeStats(2, 0, 0))
    // merge path through a RELIABLE checkpoint (executor-loss-safe on a
    // cluster); results must be byte-identical to the localCheckpoint path
    val inc = Seq(("s1", "2022-03-01", 10.0), ("s3", "2022-03-01", 3.0))
      .toDF("station_id", "date", "value")
    val st2 = KeyedStore.mergeIntoTable(inc, dir, Seq("station_id", "date"),
      checkpointDir = Some(ckpt))
    assert(st2 == KeyedStore.MergeStats(1, 1, 0))
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("station_id") -> r.getAs[Double]("value")).toMap
    assert(rows == Map("s1" -> 10.0, "s2" -> 2.0, "s3" -> 3.0))
  }

  test("mergeIntoTable: null-date increment merges into the null partition without loss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("store_nullpart").toString + "/t"
    // seed: two rows in the NULL partition, one in a dated partition
    val seed = Seq(("s1", null: String, 1.0), ("s2", null, 2.0), ("s3", "2022-03-01", 3.0))
      .toDF("station_id", "date", "value")
    KeyedStore.mergeIntoTable(seed, dir, Seq("station_id", "date"))
    // increment touches the null partition: replaces s1, creates s4
    val inc = Seq(("s1", null: String, 10.0), ("s4", null, 4.0))
      .toDF("station_id", "date", "value")
    val st = KeyedStore.mergeIntoTable(inc, dir, Seq("station_id", "date"))
    assert(st == KeyedStore.MergeStats(1, 1, 0))
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("station_id") -> r.getAs[Double]("value")).toMap
    // s2 lived only in the null partition — a non-null-safe slice filter
    // excludes it from the merge while dynamic overwrite rewrites its
    // partition → silent loss. It must survive.
    assert(rows == Map("s1" -> 10.0, "s2" -> 2.0, "s3" -> 3.0, "s4" -> 4.0))
  }

  test("mergeIntoBucketedTable: dynamic overwrite — untouched partition survives, conf untouched") {
    // The per-write `partitionOverwriteMode` option must genuinely reach
    // the insertInto command: under STATIC overwrite the whole table is
    // truncated before the merged slice lands, so a partition the
    // increment never touches silently vanishes. This test holds such a
    // bystander partition. It also pins that no session conf is mutated
    // (the old save/set/restore pattern raced across concurrent merges).
    import spark.implicits._
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(key)
    spark.sql("DROP TABLE IF EXISTS store_dyn")
    try {
      val seed = Seq(("s1", "2022-03-01", 1.0), ("s9", "2022-04-01", 9.0))
        .toDF("station_id", "date", "value")
      KeyedStore.mergeIntoBucketedTable(seed, "store_dyn",
        Seq("station_id", "date"), Seq("station_id"), 4, Some("date"))
      // increment touches ONLY the 03-01 partition
      val inc = Seq(("s1", "2022-03-01", 10.0)).toDF("station_id", "date", "value")
      val st = KeyedStore.mergeIntoBucketedTable(inc, "store_dyn",
        Seq("station_id", "date"), Seq("station_id"), 4, Some("date"))
      assert(st == KeyedStore.MergeStats(0, 1, 0))
      val rows = spark.table("store_dyn").collect()
        .map(r => r.getAs[String]("station_id") -> r.getAs[Double]("value")).toMap
      assert(rows == Map("s1" -> 10.0, "s9" -> 9.0),
        "bystander partition must survive a dynamic-overwrite merge")
      assert(spark.conf.getOption(key) == before,
        "merge must not mutate session partitionOverwriteMode")
    } finally spark.sql("DROP TABLE IF EXISTS store_dyn")
  }

  test("mergeIntoBucketedTable: mismatched spec against existing table throws") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS store_speccheck")
    try {
      val df = Seq(("s1", "2022-03-01", 1.0)).toDF("station_id", "date", "value")
      KeyedStore.mergeIntoBucketedTable(df, "store_speccheck", Seq("station_id", "date"),
        bucketCols = Seq("station_id"), nBuckets = 4, partitionCol = Some("date"))
      val inc = Seq(("s2", "2022-03-01", 2.0)).toDF("station_id", "date", "value")
      def expectMismatch(what: String)(f: => Any): Unit = {
        val e = intercept[IllegalArgumentException](f)
        assert(e.getMessage.contains(what), e.getMessage)
      }
      expectMismatch("bucket count") {
        KeyedStore.mergeIntoBucketedTable(inc, "store_speccheck", Seq("station_id", "date"),
          Seq("station_id"), nBuckets = 8, partitionCol = Some("date"))
      }
      expectMismatch("bucket columns") {
        KeyedStore.mergeIntoBucketedTable(inc, "store_speccheck", Seq("station_id", "date"),
          Seq("value"), nBuckets = 4, partitionCol = Some("date"))
      }
      expectMismatch("partition columns") {
        KeyedStore.mergeIntoBucketedTable(inc, "store_speccheck", Seq("station_id", "date"),
          Seq("station_id"), nBuckets = 4, partitionCol = None)
      }
      // the matching spec still merges fine after the failed attempts
      val st = KeyedStore.mergeIntoBucketedTable(inc, "store_speccheck", Seq("station_id", "date"),
        Seq("station_id"), 4, Some("date"))
      assert(st == KeyedStore.MergeStats(1, 0, 0))
      // bucket-column ORDER matters (hashing + sortBy): reorder must throw
      spark.sql("DROP TABLE IF EXISTS store_speccheck2")
      KeyedStore.mergeIntoBucketedTable(df, "store_speccheck2", Seq("station_id", "date"),
        Seq("station_id", "value"), 4, Some("date"))
      expectMismatch("bucket columns") {
        KeyedStore.mergeIntoBucketedTable(inc, "store_speccheck2", Seq("station_id", "date"),
          Seq("value", "station_id"), 4, Some("date"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS store_speccheck")
      spark.sql("DROP TABLE IF EXISTS store_speccheck2")
    }
  }

  test("paginate: early pages plan as TakeOrderedAndProject, never a global window") {
    import spark.implicits._
    val df = (1 to 500).map(i => (f"k$i%04d", i)).toDF("k", "v")
    def nodes(d: org.apache.spark.sql.DataFrame): Seq[String] =
      SparkTestBase.planNodeNames(d)
    val page0 = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 0)
    assert(page0.collect().map(_.getString(0)).toSeq == (1 to 10).map(i => f"k$i%04d"))
    val p0nodes = nodes(page0)
    assert(p0nodes.exists(_.contains("TakeOrderedAndProject")), p0nodes.mkString(","))
    assert(!p0nodes.exists(_.contains("Window")), p0nodes.mkString(","))
    val page3 = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 3)
    assert(page3.collect().map(_.getString(0)).toSeq == (31 to 40).map(i => f"k$i%04d"))
    assert(!nodes(page3).exists(_.contains("Window")))
    // a page past the threshold walks the cursor by keyset hops — same rows,
    // STILL no window at any depth (per-task memory bounded by the threshold)
    val deep = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 3, deepPageThreshold = 20)
    assert(deep.collect().map(_.getString(0)).toSeq == (31 to 40).map(i => f"k$i%04d"))
    assert(!nodes(deep).exists(_.contains("Window")))
    // a degenerate threshold still pages correctly (1-row keyset hops)
    val degen = KeyedStore.paginate(df, Seq("k"), limit = 5, offset = 2, deepPageThreshold = 0)
    assert(degen.collect().map(_.getString(0)).toSeq == (11 to 15).map(i => f"k$i%04d"))
    // a deep page beyond the data is empty, not an error
    val past = KeyedStore.paginate(df, Seq("k"), limit = 10, offset = 80, deepPageThreshold = 20)
    assert(past.collect().isEmpty)
  }

  test("paginateAfter: page N+1 resumes exactly from page N's last key") {
    import spark.implicits._
    val df = (1 to 500).map(i => (f"k$i%04d", i)).toDF("k", "v")
    val pageN = KeyedStore.paginate(df, Seq("k", "v"), limit = 10, offset = 2)
    val rowsN = pageN.collect()
    assert(rowsN.map(_.getString(0)).toSeq == (21 to 30).map(i => f"k$i%04d"))
    val cursor = rowsN.last.toSeq // (k, v) of the last row served
    val pageN1 = KeyedStore.paginateAfter(df, Seq("k", "v"), limit = 10, after = cursor)
    assert(pageN1.collect().map(_.getString(0)).toSeq == (31 to 40).map(i => f"k$i%04d"))
    // null cursor fields resume before any non-null value (asc_nulls_first)
    val withNull = (("k0000", null.asInstanceOf[Integer]) +: (1 to 5).map(i =>
      (f"k$i%04d", Integer.valueOf(i)))).toDF("k", "v")
    val after = KeyedStore.paginateAfter(withNull, Seq("v"), limit = 10, after = Seq(null))
    assert(after.collect().map(_.getString(0)).sorted.toSeq ==
      (1 to 5).map(i => f"k$i%04d"))
  }
}
