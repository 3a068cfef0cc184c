package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed document store + join-based MERGE — the engine's replacement for the
 * reference's `V3Handler` (`src/modules/ingestion_handler.py`), SURVEY §2.4.
 *
 * The reference deduplicates by issuing ONE store round-trip per incoming
 * document (`ingestion_handler.py:218-219`, asyncio fan-out) and classifies
 * each as create / replace / skip (`ingestion_handler.py:182-202`). Here the
 * whole probe fan-out collapses into a single equi-join on the compound key
 * — N RPCs become one shuffle (or zero, when one side broadcasts). This is
 * the headline algorithmic win over the reference (SURVEY §4).
 *
 * Scale posture (100 TB store, small daily increment):
 *  - `pruneExisting` narrows the store scan to the increment's key slice
 *    (static datatype/period/fill values + date bounds) so partition pruning
 *    and predicate pushdown keep the big side small BEFORE the join;
 *  - after pruning, the store side is usually broadcastable; otherwise AQE
 *    picks a shuffled hash join on near-uniform station×date keys;
 *  - the rewrite only touches pruned partitions in a real deployment.
 */
object KeyedStore {

  val ActionCreate = "create"
  val ActionReplace = "replace"
  val ActionUnchanged = "unchanged"

  /** Deterministic key rendering for created-row uuids: unit-separator
    * joined, null fields marked — distinct null patterns stay distinct
    * (plain concat_ws would collapse ("a",null) and (null,"a")). */
  private[graft] def keyConcat(keyCols: Seq[String]): Column =
    concat_ws("\u0001", keyCols.map(k => coalesce(col(k), lit("\u0002"))): _*)

  /** Payload = every shared non-key column (uuid is store-side identity). */
  private def payloadCols(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String]): Seq[String] = {
    val ex = existing.columns.toSet
    incoming.columns.filterNot(keyCols.contains).filterNot(_ == "uuid").filter(ex.contains).toSeq
  }

  /**
   * Deterministic within-increment key-dedup (SURVEY §7.4: the reference's
   * per-doc serial probes hide increment-internal dupes; a parallel merge
   * must resolve them explicitly). Keeps one row per key, chosen by a total
   * order over the payload — deterministic under any partitioning.
   */
  def dedupIncrement(incoming: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = incoming.columns.filterNot(keyCols.contains)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(payload.map(c => col(c).desc_nulls_last): _*)
    incoming.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * Uniqueness violations in the base table (A2): keys with >1 row — the
   * relational form of `RecordKeyException` (`ingestion_handler.py:193-195`).
   */
  def uniquenessViolations(table: DataFrame, keyCols: Seq[String]): DataFrame =
    table.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /**
   * Scale-path store pruning: restrict the existing side to the increment's
   * key envelope before joining. `staticKeys` are columns known constant (or
   * low-cardinality) in the increment — datatype/period/fill — collected
   * driver-side (tiny); the date envelope becomes a min/max range predicate
   * that pushes into the store scan (partition pruning at 100 TB).
   */
  def pruneExisting(existing: DataFrame, incoming: DataFrame, staticKeys: Seq[String],
      dateCol: String = "date"): DataFrame = {
    val bounds = incoming.agg(min(col(dateCol)).as("lo"), max(col(dateCol)).as("hi")).head()
    val statics = incoming.select(staticKeys.map(col): _*).distinct().collect()
    val staticPred = statics.map { row =>
      staticKeys.zipWithIndex.map { case (k, i) => col(k) === lit(row.get(i)) }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(true))
    existing.filter(
      staticPred && col(dateCol) >= lit(bounds.get(0)) && col(dateCol) <= lit(bounds.get(1)))
  }

  /**
   * Dedup-probe classification (A1/A3/A4): one left join of incoming against
   * existing on the compound key; each incoming row labeled
   * create / replace / unchanged. Change detection is a null-safe struct
   * comparison over the shared payload columns — field-order-insensitive
   * deep equality, like the reference's dict compare
   * (`ingestion_handler.py:197`).
   */
  def classify(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String],
      replace: Boolean = true): DataFrame = {
    val payload = payloadCols(incoming, existing, keyCols)
    // keys join NULL-SAFELY (<=>): a null key field must still match itself,
    // or rows with a stripped/absent key re-create forever and idempotency
    // breaks. The existing side's keys are renamed so the join condition is
    // unambiguous, then dropped.
    val exPayload = existing.select(
      keyCols.map(c => col(c).as(s"__exk_$c")) ++ payload.map(c => col(c).as(s"__ex_$c")) ++ Seq(
        lit(true).as("__ex_exists"),
        (if (existing.columns.contains("uuid")) col("uuid")
         else lit(null).cast("string")).as("__ex_uuid")): _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"__exk_$k")).reduce(_ && _)
    val joined = incoming.join(exPayload, joinCond, "left")
      .drop(keyCols.map(k => s"__exk_$k"): _*)
    val matched = col("__ex_exists").isNotNull
    val same = payload.map(c => col(c) <=> col(s"__ex_$c")).reduceOption(_ && _).getOrElse(lit(true))
    val action = when(!matched, lit(ActionCreate))
      .when(lit(replace) && !same, lit(ActionReplace))
      .otherwise(lit(ActionUnchanged))
    joined
      .withColumn("action", action)
      .withColumn("uuid", col("__ex_uuid"))
      .drop(payload.map(c => s"__ex_$c") ++ Seq("__ex_uuid", "__ex_exists"): _*)
  }

  /** Creates (A4): incoming rows with no existing key — a null-safe
    * left-anti join. */
  def creates(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String]): DataFrame = {
    val exKeys = existing.select(keyCols.map(c => col(c).as(s"__exk_$c")): _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"__exk_$k")).reduce(_ && _)
    incoming.join(exKeys, joinCond, "left_anti")
  }

  /**
   * Replaces (A4): matched rows whose payload differs — inner join +
   * inequality. Carries the existing uuid (the reference replaces by docId,
   * `ingestion_handler.py:140-141,233-234`).
   */
  def replaces(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String]): DataFrame =
    classify(incoming, existing, keyCols, replace = true)
      .filter(col("action") === ActionReplace)

  /**
   * Merge statistics (A6): `{created, replaced, unchanged}` counts — the
   * reference's run stats (`ingestion_handler.py:251-254`), one aggregate.
   */
  def stats(classified: DataFrame): DataFrame =
    classified.groupBy(col("action")).agg(count(lit(1)).as("n"))

  /**
   * Full MERGE (A5): returns the post-merge table state.
   *  - kept: existing rows whose key is absent from the increment, or whose
   *    incoming copy is identical / replace=false;
   *  - replaced: incoming payload under the existing uuid;
   *  - created: new keys, uuid = deterministic hash of the compound key
   *    (idempotence by construction — the reference's documented-but-
   *    unimplemented resume contract, `README.md:41-43`, comes free).
   */
  def merge(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String],
      replace: Boolean = true, assumeDeduped: Boolean = false): DataFrame = {
    // Each union branch derives from the BASE frames with its own join --
    // deliberately NOT three filters over one shared `classify` frame.
    // Reusing a complex derived frame (window + join lineage) across union
    // branches trips Spark 4.1.2's relation deduplication into corrupting
    // an expression in one branch (observed: a concat_ws separator literal
    // silently evaluated as "\u0001" instead of ""). Fresh per-branch
    // lineage avoids it and is what a real MERGE planner emits anyway.
    val inc = if (assumeDeduped) incoming else dedupIncrement(incoming, keyCols)
    val outCols = existing.columns.toSeq
    val payload = payloadCols(inc, existing, keyCols)
    val replaced = classify(inc, existing, keyCols, replace)
      .filter(col("action") === ActionReplace)
      .select(outCols.map(col): _*)
    val incMarked = inc.select(
      keyCols.map(c => col(c).as(s"__ink_$c")) ++ payload.map(c => col(c).as(s"__in_$c")) :+
        lit(true).as("__in_exists"): _*)
    val sameAsIncoming = payload.map(c => col(c) <=> col(s"__in_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val keptCond = keyCols.map(k => col(k) <=> col(s"__ink_$k")).reduce(_ && _)
    val kept = existing.join(incMarked, keptCond, "left")
      .filter(col("__in_exists").isNull || lit(!replace) || sameAsIncoming)
      .select(outCols.map(col): _*)
    val created = creates(inc, existing, keyCols)
      .withColumn("uuid", md5(keyConcat(keyCols)))
      .select(outCols.map(col): _*)
    kept.unionByName(replaced).unionByName(created)
  }

  /** Run statistics of one merge (A6; `ingestion_handler.py:251-254`). */
  final case class MergeStats(created: Long, replaced: Long, unchanged: Long)

  /**
   * Incremental MERGE into a partitioned parquet table — the engine's
   * native store (SURVEY §1.3). Scale shape:
   *
   *  1. only partitions PRESENT in the increment are read back (driver
   *     collects the increment's distinct partition values — a daily run
   *     touches a handful) → partition-pruned scan of the big table;
   *  2. merge runs against that slice only;
   *  3. dynamic partition overwrite rewrites exactly those partitions —
   *     untouched partitions of a 100 TB store are never read or written.
   *
   * Re-running the same increment is a no-op (stats all-unchanged), which
   * is the reference's documented-but-unimplemented resume contract
   * (`README.md:41-43`) for free.
   */
  def mergeIntoTable(incoming: DataFrame, storeDir: String, keyCols: Seq[String],
      partitionCol: Option[String] = Some("date"), replace: Boolean = true): MergeStats = {
    val spark = incoming.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(storeDir))
    val inc = dedupIncrement(incoming, keyCols)
    val prevOverwriteMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")

    def write(df: DataFrame): Unit = {
      val w = df.write.mode("overwrite")
      partitionCol match {
        case Some(p) => w.partitionBy(p).parquet(storeDir)
        case None => w.parquet(storeDir)
      }
    }

    try {
      if (!exists) {
        val created = inc.withColumn("uuid", md5(keyConcat(keyCols)))
        write(created)
        // count the written files, not the lineage (no recompute)
        MergeStats(spark.read.parquet(storeDir).count(), 0L, 0L)
      } else {
        val existing = spark.read.parquet(storeDir)
        val slice = partitionCol match {
          case Some(p) =>
            val parts = inc.select(col(p)).distinct().collect().map(_.get(0))
            existing.filter(col(p).isin(parts: _*)) // → partition pruning
          case None => existing
        }
        val st = stats(classify(inc, slice, keyCols, replace)).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // localCheckpoint truncates lineage so the overwrite below doesn't
        // read from the path it writes (cluster deployments would stage +
        // commit instead; dynamic overwrite keeps it partition-scoped).
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val merged = merge(inc, slice, keyCols, replace, assumeDeduped = true)
          .localCheckpoint(true)
        write(merged)
        MergeStats(st.getOrElse(ActionCreate, 0L), st.getOrElse(ActionReplace, 0L),
          st.getOrElse(ActionUnchanged, 0L))
      }
    } finally {
      // session-global conf must not leak past this call
      prevOverwriteMode match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  // ---- query surface (`V3Handler` read path, SURVEY §2.1 S8/S9, §2.6 W1) ----

  /** Point lookup by document id (S8; `ingestion_handler.py:144-151`). */
  def pointLookup(table: DataFrame, id: String, idCol: String = "uuid"): DataFrame =
    table.filter(col(idCol) === lit(id))

  /**
   * Equality-conjunction filter query (S9; `ingestion_handler.py:154-167`,
   * Mongo filter incl. dotted `value.<field>` paths → plain columns here).
   */
  def queryFilter(table: DataFrame, eq: Map[String, String]): DataFrame =
    eq.foldLeft(table) { case (df, (k, v)) => df.filter(col(k) === lit(v)) }

  /**
   * Deterministic pagination (W1): the reference's `offset` is a PAGE index,
   * not a row offset (`ingestion_handler.py:154-167` — page=offset+1,
   * pagesize=limit, default 1000). Mongo's implicit ordering becomes an
   * explicit total order on the key columns (SURVEY §7.4).
   *
   * Note: row_number over a global Window is a single-partition sort — fine
   * for page-sized results; at 100 TB serve pages from the sorted, bucketed
   * store instead (orderBy + limit push down to a TopK physical plan for
   * early pages).
   */
  def paginate(table: DataFrame, orderCols: Seq[String], limit: Int = 1000,
      offset: Int = 0): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    table.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset * limit && col("__rn") <= (offset + 1) * limit)
      .drop("__rn")
  }
}
