package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style materialization (reference `dbt_project.yml:25-43`:
  * raw/staging/intermediate are VIEWS, marts are TABLES).
  *
  * A view is a registered lazy logical plan — downstream queries fuse
  * with it and Catalyst optimizes across the boundary (filter/column
  * pushdown through the view for free). A table is a persisted parquet
  * relation in the session catalog — downstream reads scan the
  * materialized result instead of recomputing (the mart trade-off the
  * reference makes for its reporting layer). */
object Materialize {

  /** View materialization (S6): name the plan, persist nothing. */
  def view(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** Table materialization (S7: `CREATE TABLE AS` parity, reference
    * `example/my_first_dbt_model.sql:10` `materialized='table'`):
    * overwrite-save to the session catalog, return the re-read
    * relation so downstream plans scan the stored copy. */
  def table(df: DataFrame, name: String,
      path: Option[String] = None): DataFrame = {
    if (path.isEmpty) dropOrphanLocation(df.sparkSession, name)
    val w = df.write.mode("overwrite").format("parquet")
    path.foreach(p => w.option("path", p)) // external location when given
    w.saveAsTable(name)
    // refresh through df's OWN session, not the thread's active one:
    // inside a streaming foreachBatch the active session is the
    // micro-batch CLONE, so the write command invalidates the clone's
    // relation cache while the outer session — the one this library
    // reads through — keeps serving the stale pre-write file listing
    // (found live: batch N+1 joined against batch N's gram index)
    refresh(df.sparkSession, name)
    df.sparkSession.table(name)
  }

  /** Partitioned table materialization: like [[table]] but laid out by
    * `partitionCol`, so later partition-scoped merges (the
    * [[tableIncremental]] dynamic-overwrite machinery) rewrite only
    * the touched slices instead of the whole table. Rows are clustered
    * by target partition first — the same files-per-partition bound as
    * every partitioned write in this repo. */
  def partitionedTable(df: DataFrame, name: String, partitionCol: String,
      path: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (path.isEmpty) dropOrphanLocation(df.sparkSession, name)
    val w = df.repartition(col(partitionCol))
      .write.mode("overwrite").format("parquet").partitionBy(partitionCol)
    path.foreach(p => w.option("path", p))
    w.saveAsTable(name)
    refresh(df.sparkSession, name) // see table()
    df.sparkSession.table(name)
  }

  /** A run that dies between writing a managed table's files and
    * committing its catalog entry leaves an orphan directory that
    * `saveAsTable` then refuses (LOCATION_ALREADY_EXISTS) — remove the
    * location iff the catalog has NO entry for the table (a cataloged
    * table's location is never touched; overwrite mode owns that). */
  private[graft] def dropOrphanLocation(spark: SparkSession, name: String): Unit =
    if (!spark.catalog.tableExists(name)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        name.toLowerCase(java.util.Locale.ROOT))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) { fs.delete(wh, true); () }
    }

  /** Bucketed table materialization (reference "clustering" intent,
    * `README.md:12,90`): co-locate a table on its join key so repeated
    * fact⋈fact joins on that key skip the shuffle entirely — the
    * biggest single lever for a join-heavy mart layer at 100 TB (both
    * sides bucketed on the key ⇒ SortMergeJoin with zero Exchange). */
  def bucketedTable(df: DataFrame, name: String, bucketCols: Seq[String],
      numBuckets: Int, path: Option[String] = None): DataFrame = {
    if (path.isEmpty) dropOrphanLocation(df.sparkSession, name)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
    path.foreach(p => w.option("path", p)) // external location when given
    w.saveAsTable(name)
    refresh(df.sparkSession, name) // see table()
    df.sparkSession.table(name)
  }

  /** Partition-bounded incremental table materialization (the
    * reference's daily `--day` run shape, `README.md:82`, as dbt's
    * `insert_overwrite` incremental strategy): the table is partitioned
    * by `partitionCol`; each run merges the increment with ONLY the
    * partitions it touches (keep-latest dedup per `keys` within them)
    * and rewrites just those partitions via dynamic partition
    * overwrite. The table is therefore always deduplicated AT REST —
    * readers are plain pruned scans, and a daily increment at 100 TB
    * rewrites one day's partition, never the table.
    *
    * Touched partition VALUES are collected to the driver so the
    * merge read is STATICALLY pruned (`PartitionFilters` on the scan);
    * an incremental batch touches a bounded handful of partitions by
    * contract, so this is a list of dates, not data.
    *
    * Contract (same as dbt insert_overwrite): a key's partition value
    * must be stable across its versions — a key that MOVES partitions
    * between runs leaves its old version in the untouched partition
    * (deduplicate cross-partition movers with a compaction pass). */
  /** Compaction pass for cross-partition key movers — the reconciler
    * for [[tableIncremental]]'s documented contract hole: a key whose
    * partition value CHANGES between runs (a restated `updated_at`, a
    * corrected event date) leaves its stale older version behind in the
    * partition the incremental run never touched. `compact` restores
    * the global keep-latest invariant while rewriting ONLY the
    * partitions that actually hold a stale version:
    *
    *  1. one map-side-combinable aggregate over the table finds MOVER
    *     keys (min(partition) != max(partition)) — output is tiny (only
    *     keys that actually moved), nothing else shuffles;
    *  2. the global keep-latest winner per mover key is computed over
    *     mover rows only;
    *  3. partitions holding a non-winner mover row are the AFFECTED set
    *     (collected — a bounded list of partition values, same contract
    *     as tableIncremental's touched-partition list);
    *  4. affected partitions are re-deduplicated (stale mover versions
    *     dropped) and rewritten via dynamic partition overwrite; every
    *     other partition is untouched bytes.
    *
    * Post-condition: table state ≡ full-rebuild
    * `dedupLatest(allRows, keys, orderCol)` (property-tested), at the
    * cost of one aggregate scan plus a rewrite of only the affected
    * partitions. Run it after restatement-bearing loads, the way dbt
    * projects schedule a periodic `--full-refresh` — except this never
    * rewrites the 100 TB table, just the handful of partitions movers
    * landed in. Returns the affected partition values. */
  def compact(spark: SparkSession, name: String, keys: Seq[String],
      orderCol: String, partitionCol: String): Seq[Any] = {
    import org.apache.spark.sql.functions.{broadcast, col, max, min, struct}
    val t = spark.table(name)
    val keyCols = keys.map(col)
    val movers = t.groupBy(keyCols: _*)
      .agg(min(col(partitionCol)).as("__pmin"),
        max(col(partitionCol)).as("__pmax"))
      .filter(col("__pmin") =!= col("__pmax"))
      .select(keyCols: _*)
    // movers are rare by contract — broadcast them through both uses.
    // moverRows (every version of every mover key) is the frame both
    // the winner computation and the stale probe derive from; persisting
    // IT (tiny: versions-per-mover rows) means the table is scanned once
    // here instead of once per consumer
    val moverRows = t.join(broadcast(movers), keys, "left_semi").persist()
    try {
    val winners = graft.stage.Staging
      .dedupLatestAgg(moverRows, keys, col(orderCol))
      .select((keyCols :+ col(partitionCol).as("__pwin")): _*)
    val stale = moverRows.join(broadcast(winners), keys)
      .filter(col(partitionCol) =!= col("__pwin"))
    val affected = stale.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.nonEmpty) {
      val cols = t.columns.toSeq
      val rewritten = t.filter(col(partitionCol).isin(affected: _*))
        .join(broadcast(winners), keys, "left")
        .filter(col("__pwin").isNull || col(partitionCol) === col("__pwin"))
        .select(cols.map(col): _*)
        .persist()
      try {
        // dynamic partition overwrite only touches partitions PRESENT in
        // the output — a partition whose entire content was stale mover
        // versions produces zero rows and would be left as-is, so it
        // must be dropped explicitly
        val kept = rewritten.select(col(partitionCol)).distinct()
          .collect().map(_.get(0)).toSet
        dropPartitions(spark, name,
          affected.filterNot(kept.contains)
            .map(v => Seq(partitionCol -> v)))
        val PoKey = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(PoKey)
        spark.conf.set(PoKey, "dynamic")
        try rewritten.repartition(col(partitionCol))
          .write.mode("overwrite").insertInto(name)
        finally prev match {
          case Some(v) => spark.conf.set(PoKey, v)
          case None => spark.conf.unset(PoKey)
        }
      } finally { rewritten.unpersist(blocking = false); () }
    }
    affected
    } finally { moverRows.unpersist(blocking = false); () }
  }

  /** Incremental AGGREGATE materialization — dbt's incremental model
    * for additive marts (vs [[tableIncremental]]'s keep-latest row
    * semantics). `partial` is an already-aggregated increment (group
    * keys + value columns); every NON-key column must be
    * sum-mergeable (sums of sums, counts as sums of partial counts —
    * the associative-merge property that makes a 100 TB mart
    * maintainable without ever re-scanning history).
    *
    * REPLAY-CONVERGENT, same recovery contract as [[tableIncremental]]
    * ("replay converges"). Summing a replayed partial into the live
    * table can never be made absorbing, so this operator never does
    * that; instead the batch-keyed partials are STORED and touched
    * slices of the aggregate are RECOMPUTED from storage:
    *
    *  1. the partial lands in `<name>__partials`, partitioned by
    *     (partitionCol, __batch): a replayed `batchId` dynamic-
    *     overwrites exactly its own slices with identical bytes
    *     (the partial is a deterministic function of its input);
    *  2. every partition value the batch touches (bounded collect —
    *     an increment touches a handful of partitions) is recomputed
    *     by re-aggregating ALL stored partials for that value — a
    *     partition-pruned read of pre-aggregated rows, never a fact
    *     scan; recompute-from-stored is absorbing by construction;
    *  3. only the touched slices of `name` rewrite via dynamic
    *     partition overwrite, value columns cast back to the table
    *     schema so decimal widening from the re-aggregation never
    *     drifts it.
    *
    * Crash anywhere, replay the same (batchId, partial): step 1
    * rewrites identical content and steps 2-3 are deterministic
    * functions of storage, so any partial state converges to the
    * clean-apply state; a duplicate apply is a content no-op (spec:
    * "aggIncremental replay converges").
    *
    * Post-condition: table ≡ the full aggregate over all increments
    * ever merged (the q123 oracle checks exactly this). Cost note: a
    * partition's recompute reads one stored row-set per batch that
    * ever touched it — pre-aggregated rows, so history stays cheap;
    * an ingest that hits the same partition every batch grows that
    * read O(#batches) — fold history with [[checkpointPartials]],
    * which replaces all slices older than a watermark with one merged
    * slice (recompute input then stays bounded, spec-pinned), or pass
    * `foldEvery > 0` to run that fold automatically whenever any
    * partition's slice count exceeds it (the streaming ingest paths
    * default to this cadence). */
  def aggIncremental(spark: SparkSession, name: String,
      partial: DataFrame, keys: Seq[String],
      partitionCol: String, batchId: String,
      foldEvery: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{col, collect_set, lit, sum}
    val partials = s"${name}__partials"
    val valCols = partial.columns.filterNot(keys.contains).toSeq
    // the touched-partition set rides the store action as an observe
    // metric: it is read off the rows actually WRITTEN (not a
    // re-evaluation of `partial`, which a nondeterministic input could
    // shift), and costs no extra job. Bounded by contract: an
    // increment touches a handful of partitions.
    val obs = org.apache.spark.sql.Observation()
    val keyed = partial.withColumn("__batch", lit(batchId))
      .observe(obs, collect_set(col(partitionCol)).as("touched"))
    // ---- 1. store this batch's partial, idempotently
    if (!spark.catalog.tableExists(partials)) {
      keyed.repartition(col(partitionCol))
        .write.mode("overwrite").format("parquet")
        .partitionBy(partitionCol, "__batch").saveAsTable(partials)
    } else {
      val pCols = spark.table(partials).columns.toSeq
      withDynamicOverwrite(spark) {
        keyed.select(pCols.map(col): _*)
          .repartition(col(partitionCol))
          .write.mode("overwrite").insertInto(partials)
      }
    }
    refresh(spark, partials)
    val touched = graft.quality.Quality.obsSeq(obs, "touched")
    // ---- 2. recompute from stored partials. First create of `name`
    // recomputes EVERY partition present in the partials table, not
    // just this batch's — a stored partial whose batch crashed before
    // this step (and is never replayed) must not stay invisible until
    // a later batch happens to touch its partition.
    val firstCreate = !spark.catalog.tableExists(name)
    // visibleSlices: a crashed fold can leave a partition holding both
    // its checkpoint and the absorbed originals — the watermark view
    // reads that as the converged content, so the recompute is correct
    // in every fold crash window (not just between clean folds)
    val scope = visibleSlices(
      if (firstCreate) spark.table(partials)
      else spark.table(partials)
        .filter(col(partitionCol).isin(touched: _*)),
      partitionCol)
    val merged = scope
      .drop("__batch")
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valCols.head)).as(valCols.head),
        valCols.tail.map(c => sum(col(c)).as(c)): _*)
    // ---- 3. rewrite only those slices of the published aggregate
    if (firstCreate) {
      merged
        .select(partial.columns.toSeq
          .map(c => col(c).cast(partial.schema(c).dataType)): _*)
        .repartition(col(partitionCol))
        .write.mode("overwrite").format("parquet")
        .partitionBy(partitionCol).saveAsTable(name)
    } else {
      val schema = spark.table(name).schema
      withDynamicOverwrite(spark) {
        merged
          .select(schema.map(f => col(f.name).cast(f.dataType)): _*)
          .repartition(col(partitionCol))
          .write.mode("overwrite").insertInto(name)
      }
    }
    refresh(spark, name)
    // ---- 4. fold cadence: with foldEvery > 0, once any partition
    // holds more than foldEvery slices, everything strictly below THIS
    // batch id folds into one synthetic slice ([[checkpointPartials]])
    // — the knob that keeps a continuously ingesting deployment's
    // recompute input bounded WITHOUT manual maintenance. The check is
    // metadata-only: SHOW PARTITIONS lists one row per (partition,
    // batch) slice, and the cadence itself bounds that listing at
    // ≤ foldEvery+1 rows per partition. Sortable batch ids give the
    // fold clean watermark semantics; under arbitrary ids the old/new
    // split is arbitrary but content still converges (the merge is
    // associative, spec-pinned).
    if (foldEvery > 0) {
      val slices = spark.sql(s"SHOW PARTITIONS $partials")
        .collect().map(_.getString(0).takeWhile(_ != '/'))
      val worst = slices.groupBy(identity)
        .valuesIterator.map(_.length).foldLeft(0)(math.max)
      if (worst > foldEvery)
        try { checkpointPartials(spark, name, keys, partitionCol,
          batchId); () }
        catch { case e: IllegalArgumentException =>
          // a '#'-leading batch id the fold refuses as a watermark:
          // the APPLY already landed and content is correct, so
          // degrade to growth-with-a-warning — failing here would
          // turn a maintenance problem into an ingest outage that
          // replays into the same failure forever
          System.err.println(
            s"[aggIncremental] history fold skipped for $name: " +
              e.getMessage)
        }
    }
    spark.table(name)
  }

  /** History fold for [[aggIncremental]]'s partials table: replaces
    * every stored slice with a batch id strictly below `olderThan`
    * (string-ordered — use sortable batch ids) with ONE merged slice
    * per partition under the synthetic id `#ckpt_<olderThan>`. '#'
    * sorts below every alphanumeric batch id, so a later checkpoint
    * folds earlier checkpoints in and a recompute's `__batch`-blind
    * read picks the fold up transparently. After the fold, a
    * partition's recompute input is one row-set for all folded
    * history plus one per unfolded batch — INDEPENDENT of how many
    * batches ever touched it (the one unbounded-growth path in the
    * incremental-aggregate design; [[compactFiles]] cannot do this,
    * it merges files WITHIN a (partition, batch) slice).
    *
    * Crash/replay: the fold commits with ONE dynamic-overwrite write
    * (only the synthetic `(partition, #ckpt_X)` slices — surviving
    * newer slices are untouched bytes) followed by ONE batched
    * `DROP PARTITION` of every absorbed slice. Neither step is atomic
    * across partitions, and a crash between them leaves a partition
    * holding BOTH its fold and the absorbed originals — which is why
    * every partials reader goes through [[visibleSlices]]: the
    * absorption watermark makes that state read as exactly the
    * converged content, so readers are correct in EVERY crash window
    * and a replayed fold re-derives identical bytes and finishes the
    * drop. Aggregate CONTENT is untouched: fold-then-recompute ≡
    * recompute (associative sums), spec-pinned. Returns the folded
    * partition values.
    *
    * Contract: `olderThan` must trail the REPLAY FRONTIER — a batch
    * replayed after the fold passed its id would re-add content the
    * fold already absorbed (double count). The at-least-once streaming
    * paths satisfy this by construction: they fold at the CURRENT
    * batch id, and only the newest batch can be redelivered (earlier
    * offsets are checkpoint-committed).
    *
    * Scale (the r13 partitions-axis finding): the pre-r13 fold
    * committed with one serial `INSERT OVERWRITE` statement PER
    * partition — O(#partitions) driver-side commands, measured 18.5×
    * at 24× the partition count (SCALEBENCH_r13, agg_fold_parts,
    * 1 440 commits). The fold is now TWO commands total regardless of
    * partition count: the heavy merge is one distributed job over the
    * visible sub-watermark slices, and the cleanup is one batched
    * metadata statement ([[dropPartitions]]). */
  def checkpointPartials(spark: SparkSession, name: String,
      keys: Seq[String], partitionCol: String,
      olderThan: String): Seq[Any] = {
    import org.apache.spark.sql.functions.{col, lit, sum}
    require(olderThan.nonEmpty && !olderThan.startsWith("#"),
      "olderThan must be a real (alphanumeric-leading) batch id")
    val partials = s"${name}__partials"
    val syn = s"#ckpt_$olderThan"
    val t = spark.table(partials)
    val valCols = t.columns.toSeq
      .filterNot(c => c == partitionCol || c == "__batch")
      .filterNot(keys.contains)
    val schema = t.schema
    // bounded collect (metadata-sized): every sub-watermark slice that
    // is not this fold's own synthetic id. REAL slices mark a partition
    // as needing the fold; older `#ckpt_*` slices are absorbed into
    // the new fold but never trigger one alone (a ckpt-only partition
    // is already one slice — replays stay metadata-only no-ops).
    val sub = t
      .filter(col("__batch") < lit(olderThan) &&
        col("__batch") =!= lit(syn))
      .select(col(partitionCol), col("__batch")).distinct()
      .collect().map(r => (r.get(0), r.getString(1))).toSeq
    val affected = sub.collect {
      case (p, b) if !b.startsWith("#") => p
    }.distinct
    if (affected.isEmpty) return affected
    val affectedSet = affected.toSet
    // the merge input is the VISIBLE sub-watermark content: in the
    // normal state that is every real slice + any older checkpoint; in
    // a crashed-fold state the watermark hides the already-absorbed
    // originals and the existing synthetic slice re-merges to itself —
    // the replay convergence this protocol rests on
    val folded = visibleSlices(
        t.filter(col(partitionCol).isin(affected: _*)), partitionCol)
      .filter(col("__batch") < lit(olderThan))
      .groupBy((partitionCol +: keys).distinct.map(col): _*)
      .agg(sum(col(valCols.head)).as(valCols.head),
        valCols.tail.map(c => sum(col(c)).as(c)): _*)
      .withColumn("__batch", lit(syn))
    // commit 1 of 2: one dynamic-overwrite write replaces exactly the
    // (partition, syn) leaf slices; surviving >= olderThan slices and
    // every other partition are untouched bytes
    MetaOps.inc("insert_overwrite_commit")
    withDynamicOverwrite(spark) {
      folded
        .select(schema.map(f => col(f.name).cast(f.dataType)): _*)
        .repartition(col(partitionCol))
        .write.mode("overwrite").insertInto(partials)
    }
    // commit 2 of 2: one batched metadata statement drops every
    // absorbed slice (older checkpoints included) in the folded
    // partitions — quoted/escaped centrally, any partition value
    val dropSpecs = sub.collect {
      case (p, b) if affectedSet.contains(p) =>
        Seq(partitionCol -> p, "__batch" -> (b: Any))
    }
    dropPartitions(spark, partials, dropSpecs)
    refresh(spark, partials)
    affected
  }

  /** Crash-window-proof view of an [[aggIncremental]] partials frame.
    * For each partition, the ABSORPTION WATERMARK `W` is the largest
    * `X` over `#ckpt_X` slices present; visible content is the
    * `#ckpt_W` slice plus real slices with `__batch >= W`. In the
    * normal state (no fold debris) this is the identity — a folded
    * partition's only sub-watermark slice IS its checkpoint. After a
    * crash between [[checkpointPartials]]' two commits, a partition
    * holds its fold AND the absorbed originals (or two generations of
    * checkpoint): the watermark hides exactly the absorbed rows, so
    * every reader sees the converged content in every crash window —
    * the property that lets the fold commit O(1) statements instead
    * of a serial per-partition loop. */
  private def visibleSlices(scoped: DataFrame,
      partitionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, concat, length, lit,
      max, substring, when}
    val isSyn = col("__batch").startsWith("#ckpt_")
    val wm = max(when(isSyn,
        substring(col("__batch"), 7, Int.MaxValue)))
      .over(Window.partitionBy(col(partitionCol)))
    scoped.withColumn("__wm", wm)
      .filter(col("__wm").isNull ||
        (!isSyn && col("__batch") >= col("__wm")) ||
        col("__batch") === concat(lit("#ckpt_"), col("__wm")))
      .drop("__wm")
  }

  /** Drop an [[aggIncremental]] aggregate AND its `__partials` state
    * table, locations included — the reset a fixture-rebuilding caller
    * needs (dropping only the aggregate would leave stored partials
    * that the next run's recompute silently folds back in). */
  def dropAggState(spark: SparkSession, name: String): Unit =
    Seq(name, s"${name}__partials").foreach { t =>
      dropTable(spark, s"$t")
      dropOrphanLocation(spark, t)
    }

  /** The ONE builder for every `ALTER TABLE … DROP PARTITION` in the
    * repo: all `specs` (each a (column → value) list) go into a SINGLE
    * batched statement — the emptied-slice metadata pass is O(1)
    * statements, not O(#partitions) of serial driver round-trips, the
    * shape that made the r12 erasure queries metadata-bound. Values are
    * single-quote-escaped, so a value containing `'` can never break
    * the statement. No-op on an empty spec list. */
  private[graft] def dropPartitions(spark: SparkSession, table: String,
      specs: Seq[Seq[(String, Any)]]): Unit =
    if (specs.nonEmpty) {
      def q(v: Any): String =
        "'" + String.valueOf(v).replace("'", "''") + "'"
      val parts = specs.map(_.map { case (c, v) => s"$c=${q(v)}" }
        .mkString("PARTITION (", ", ", ")")).mkString(", ")
      MetaOps.inc("alter_drop_partitions_stmt")
      MetaOps.add("partitions_dropped", specs.size.toLong)
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS $parts")
      ()
    }

  /** Counted wrapper for every relation-cache invalidation the library
    * issues (each one re-lists table files on the next read — driver
    * metadata work the [[MetaOps]] bill must see). */
  private[graft] def refresh(spark: SparkSession, name: String): Unit = {
    MetaOps.inc("refresh_table")
    spark.catalog.refreshTable(name)
  }

  /** Counted `DROP TABLE IF EXISTS` — every catalog drop in the
    * publish/recover protocols goes through here so the [[MetaOps]]
    * bill sees it. */
  private[graft] def dropTable(spark: SparkSession, name: String): Unit = {
    MetaOps.inc("drop_table")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    ()
  }

  /** Run `body` under dynamic partition-overwrite mode, restoring the
    * previous setting after. */
  private[graft] def withDynamicOverwrite(spark: SparkSession)(
      body: => Unit): Unit = {
    val PoKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(PoKey)
    spark.conf.set(PoKey, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(PoKey, v)
      case None => spark.conf.unset(PoKey)
    }
  }

  /** Crash/replay contract (spec: "tableIncremental replay
    * converges"): the dynamic-partition-overwrite commit replaces each
    * touched partition near-atomically, but the SET of touched
    * partitions is not one atomic unit — a crash mid-commit can land
    * some partitions and not others. Recovery is REPLAY, not repair:
    * the merge (keep-latest of existing ∪ increment) is deterministic
    * and absorbing, so re-running the same increment from any partial
    * state converges to the clean-apply state, and a duplicate apply
    * is a content no-op. Publish-grade tables that need an atomic
    * all-or-nothing promotion go through [[publishAudited]] instead. */
  def tableIncremental(spark: SparkSession, name: String,
      increment: DataFrame, keys: Seq[String], orderCol: String,
      partitionCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    def dedup(df: DataFrame) =
      graft.stage.Staging.dedupLatest(df, keys, col(orderCol))
    if (!spark.catalog.tableExists(name)) {
      // cluster rows by their target partition before the partitioned
      // write: without it every one of the N shuffle tasks opens a file
      // in every partition it touches (tasks × partitions files); with
      // it the file count tracks the partition count
      dedup(increment).repartition(col(partitionCol))
        .write.mode("overwrite").format("parquet")
        .partitionBy(partitionCol).saveAsTable(name)
    } else {
      val touched = increment.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toSeq
      val cols = spark.table(name).columns.toSeq
      val existing = spark.table(name)
        .filter(col(partitionCol).isin(touched: _*))
      val merged = dedup(existing
        .unionByName(increment.select(cols.map(col): _*)))
      val PoKey = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(PoKey)
      spark.conf.set(PoKey, "dynamic")
      // insertInto is positional — select in table-schema order;
      // repartition by the partition value for the same
      // files-per-partition bound as the initial load
      try merged.select(cols.map(col): _*)
        .repartition(col(partitionCol))
        .write.mode("overwrite").insertInto(name)
      finally prev match {
        case Some(v) => spark.conf.set(PoKey, v)
        case None => spark.conf.unset(PoKey)
      }
    }
    spark.table(name)
  }

  /** Retention enforcement: drop every partition of `name` whose
    * `partitionCol` VALUE sorts strictly below `cutoff` — a
    * metadata-only operation (`ALTER TABLE … DROP PARTITION`): retained
    * data is never read or rewritten, which is the whole point of
    * partition-level retention at 100 TB (dropping 3 years of history
    * costs O(partitions dropped), not a table scan). Values compare as
    * strings — ISO dates sort correctly. The partition list is
    * catalog METADATA (one row per partition, the same bounded driver
    * list `tableIncremental` touches), not data. */
  def expirePartitions(spark: SparkSession, name: String,
      partitionCol: String, cutoff: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val expired = spark.sql(s"SHOW PARTITIONS $name")
      .collect()
      .map(_.getString(0))
      .collect { case p if p.startsWith(s"$partitionCol=") =>
        p.stripPrefix(s"$partitionCol=")
      }
      .filter(_ < cutoff)
    dropPartitions(spark, name,
      expired.toSeq.map(v => Seq(partitionCol -> (v: Any))))
    spark.table(name)
  }

  /** Right-to-erasure (GDPR art. 17) for a partitioned table: delete
    * every row whose `keyCol` is in `keys`, rewriting ONLY partitions
    * that actually contain a target key. One pruned-aggregate scan
    * finds the affected partition values (rows matching keys →
    * distinct partition value — a bounded list, same contract as
    * [[tableIncremental]]'s touched set); those partitions are
    * rewritten minus the matching rows via dynamic partition
    * overwrite; untouched partitions are untouched bytes. `keys` is
    * broadcast through both uses — an erasure batch is a bounded
    * request list, not data. Returns the affected partition values
    * (the audit trail a DPO wants). */
  def eraseKeys(spark: SparkSession, name: String, keyCol: String,
      keys: DataFrame, partitionCol: String): Seq[Any] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val k = broadcast(keys.select(col(keys.columns.head).as(keyCol))
      .distinct())
    val affected = spark.table(name).join(k, Seq(keyCol), "left_semi")
      .select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    eraseKeysIn(spark, name, keyCol, keys, partitionCol, affected)
    affected
  }

  /** The rewrite half of [[eraseKeys]], with the affected partition
    * values already discovered: a multi-artifact erasure (the corpus
    * [[graft.queries.CorpusBuild.eraseDocs]]) finds every table's
    * affected list in ONE combined action, then runs these rewrites in
    * PARALLEL — safe because each call targets its own table (own
    * committer staging dir; contrast [[checkpointPartials]]' same-table
    * serial commit loop), and the emptied-slice drop is one batched
    * statement per table via [[dropPartitions]]. */
  private[graft] def eraseKeysIn(spark: SparkSession, name: String,
      keyCol: String, keys: DataFrame, partitionCol: String,
      affected: Seq[Any]): Unit =
    if (affected.nonEmpty) {
      import org.apache.spark.sql.functions.{broadcast, col}
      val k = broadcast(keys.select(col(keys.columns.head).as(keyCol))
        .distinct())
      val t = spark.table(name)
      val schema = t.schema
      val kept = t.filter(col(partitionCol).isin(affected: _*))
        .join(k, Seq(keyCol), "left_anti")
      // dynamic overwrite only rewrites partitions PRESENT in the
      // output: a partition erased down to zero rows must be dropped
      // explicitly or its stale files survive
      val keptParts = kept.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toSet
      withDynamicOverwrite(spark) {
        kept
          .select(schema.map(f => col(f.name)): _*)
          .repartition(col(partitionCol))
          .write.mode("overwrite").insertInto(name)
      }
      dropPartitions(spark, name,
        affected.filterNot(keptParts.contains)
          .map(v => Seq(partitionCol -> v)))
    }

  /** Right-to-erasure for an INCREMENTAL aggregate — the
    * [[aggIncremental]] state pair: deletes every row of the requested
    * keys from BOTH the published table and the stored batch partials,
    * rewriting only the (partition, batch) slices that hold them (a
    * `kept` filtered on the partition value alone would rewrite every
    * batch slice of an affected partition — pure write amplification
    * when a hot partition holds many slices). Erasing only the
    * published table would be an illusion: the next batch touching
    * the partition recomputes from the stored partials and resurrects
    * the key. A partials (partition, batch) slice emptied by the
    * erasure is dropped explicitly — dynamic overwrite rewrites only
    * slices PRESENT in the output, so a fully-erased slice would
    * otherwise keep its stale files and resurrect the key anyway.
    *
    * Composes with the fold cadence in any order (spec: the
    * interleaved fold/erase/apply property): a fold merges slices but
    * never changes content, and this erase treats a synthetic
    * `#ckpt_*` slice like any other. Replay-safe: a second identical
    * request finds no slices and touches nothing; a crash between the
    * partials scrub and the published erase replays into the
    * published-only leg. Returns (published partitions rewritten,
    * partials slices touched). */
  def eraseAggKeys(spark: SparkSession, name: String, keyCol: String,
      keys: DataFrame, partitionCol: String): (Seq[Any], Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val partials = s"${name}__partials"
    val k = broadcast(keys.select(col(keys.columns.head).as(keyCol))
      .distinct())
    val nSlices =
      if (!spark.catalog.tableExists(partials)) 0L
      else {
        val t = spark.table(partials)
        // bounded collect: the (partition, batch) slice pairs that
        // hold the requested keys
        val slices = t.join(k, Seq(keyCol), "left_semi")
          .select(col(partitionCol), col("__batch")).distinct()
          .collect().map(r => (r.get(0), r.getString(1))).toSeq
        if (slices.nonEmpty) {
          val schema = t.schema
          // ONLY the touched slices: untouched batch slices of an
          // affected partition never enter the output, so dynamic
          // overwrite never rewrites them
          val touched = slices.map { case (p, b) =>
            col(partitionCol) === lit(p) && col("__batch") === lit(b)
          }.reduce(_ || _)
          val kept = t.filter(touched).join(k, Seq(keyCol), "left_anti")
          // bounded: <= |slices| — taken BEFORE the overwrite so the
          // drop list reads one consistent snapshot
          val keptSlices = kept
            .select(col(partitionCol), col("__batch")).distinct()
            .collect().map(r => (r.get(0), r.getString(1))).toSet
          withDynamicOverwrite(spark) {
            kept.select(schema.map(f => col(f.name)): _*)
              .repartition(col(partitionCol))
              .write.mode("overwrite").insertInto(partials)
          }
          dropPartitions(spark, partials,
            slices.filterNot(keptSlices.contains).map { case (p, b) =>
              Seq(partitionCol -> p, "__batch" -> b)
            })
          refresh(spark, partials)
        }
        slices.size.toLong
      }
    val published =
      if (spark.catalog.tableExists(name))
        eraseKeys(spark, name, keyCol, keys, partitionCol)
      else Seq.empty[Any]
    (published, nSlices)
  }

  /** Small-file compaction: rewrite every partition whose FILE COUNT
    * exceeds `maxFiles`, clustering rows by partition value so each
    * rewritten partition lands in few large files (the daily
    * OPTIMIZE/rewrite_data_files maintenance pass — at 100 TB, small
    * files are the silent scan killer: per-file open cost and
    * footer reads dominate once files ≪ the 128 MB split size).
    * Detection is a distributed `input_file_name()` aggregate (never
    * a driver filesystem walk); only the affected partition VALUES
    * (bounded metadata) reach the driver. Content is bit-identical
    * after compaction — only layout changes. Returns affected
    * partition values. */
  def compactFiles(spark: SparkSession, name: String,
      partitionCol: String, maxFiles: Int = 1): Seq[Any] = {
    import org.apache.spark.sql.functions.{col, countDistinct, input_file_name}
    val t = spark.table(name)
    // nondeterministic exprs may be projected but not aggregated —
    // bind the file name to a column first
    val affected = t
      .select(col(partitionCol), input_file_name().as("__f"))
      .groupBy(col(partitionCol))
      .agg(countDistinct(col("__f")).as("__nf"))
      .filter(col("__nf") > maxFiles)
      .select(col(partitionCol)).collect().map(_.get(0)).toSeq
    if (affected.nonEmpty) {
      val schema = t.schema
      val rewritten = t.filter(col(partitionCol).isin(affected: _*))
      val PoKey = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(PoKey)
      spark.conf.set(PoKey, "dynamic")
      try rewritten
        .select(schema.map(f => col(f.name)): _*)
        .repartition(col(partitionCol))
        .write.mode("overwrite").insertInto(name)
      finally prev match {
        case Some(v) => spark.conf.set(PoKey, v)
        case None => spark.conf.unset(PoKey)
      }
    }
    affected
  }

  /** Write-audit-publish (the Iceberg/dbt "WAP" release pattern, the
    * blue-green form of the reference's test-then-promote CI gate,
    * reference `.github/workflows/dbt-ci.yml:36-42`): the new build is
    * staged under an invisible name, the quality suite runs against
    * the STAGED files, and only a fully passing audit swaps it in.
    * Readers therefore never observe a half-written or failing table:
    * publish is a catalog rename (O(1) metadata — data files are
    * written once and never copied), and a failed audit drops the
    * staging table leaving the previous published version untouched.
    *
    * Returns (published?, audit results). `warnAsError` promotes
    * warn-tier checks to blocking, dbt `--warn-error` parity.
    *
    * `crashAfterStep` is TEST-ONLY fault injection: ≥0 throws
    * [[CrashInjected]] after the numbered step of the swap sequence
    * completes (0 staging written, 1 audit run, 2 prev dropped,
    * 3 rename-aside, 4 rename-in), so the crash-consistency spec
    * exercises the REAL op order instead of hand-modeled states. */
  def publishAudited(df: DataFrame, name: String,
      checks: Seq[graft.quality.Check], warnAsError: Boolean = false,
      crashAfterStep: Int = -1)
      : (Boolean, Seq[graft.quality.Quality.Result]) = {
    def crash(step: Int): Unit =
      if (crashAfterStep == step) throw new CrashInjected(step)
    val spark = df.sparkSession
    val staging = name + "__staging"
    table(df, staging)
    crash(0)
    // one action for the whole audit suite (run() pays one per check).
    // A hidden NonEmpty leg rides the same union — zero extra jobs —
    // so the post-swap guard below can tell "rename lost the staged
    // rows" from a legitimately empty publish without its own probe.
    val counts = graft.quality.Quality.countsOnce(Seq(
      spark.table(staging) -> (checks :+ graft.quality.NonEmpty()))).head
    val results =
      graft.quality.Quality.resultsOf(checks, counts.init, warnAsError)
    crash(1)
    val ok = results.forall(_.passed)
    if (ok) {
      val stagedNonEmpty = counts.last == 0L
      // Swap via rename-aside, NOT drop-then-rename: the previous
      // version keeps existing (as <name>__prev) until the new one is
      // in place, so a crash mid-publish can always be recovered from
      // files on disk — never "no published table and data deleted".
      // The remaining non-atomic window (between the two renames,
      // <name> resolves to nothing) is inherent to a catalog without
      // multi-op transactions; recoverPrev() documents the repair.
      val prev = name + "__prev"
      dropTable(spark, s"$prev")
      dropOrphanLocation(spark, prev)
      crash(2)
      if (spark.catalog.tableExists(name))
        renameTable(spark, name, prev)
      crash(3)
      // a previous JVM's published table may survive as files with no
      // catalog entry (in-memory catalog died) — clear the orphan or
      // the rename refuses with LOCATION_ALREADY_EXISTS
      dropOrphanLocation(spark, name)
      val renamedPartitioned = renameTable(spark, staging, name)
      // a catalog RENAME does not touch the cache manager: any
      // persisted plan over the OLD version canonicalizes to the same
      // relation (same warehouse location) and would keep serving
      // stale blocks to every post-publish reader in this session —
      // found live when runIncremental's manifest read the pre-merge
      // corpus. Publishing must invalidate readers' caches.
      refresh(spark, name)
      // the audits ran on the STAGED files; a PARTITIONED rename is
      // the one step that can lose them (partition metadata left at
      // the old path — the class renameTable repairs). One limit-1
      // probe, paid only for partitioned publishes, turns any residual
      // silent-empty into a loud failure while the __prev generation
      // still exists on disk. An unpartitioned rename moves the whole
      // directory — nothing to lose silently, no probe.
      if (renamedPartitioned && stagedNonEmpty)
        require(!spark.table(name).isEmpty,
          s"publish of $name: staged rows lost in the swap")
      crash(4)
      dropTable(spark, s"$prev")
    } else {
      dropTable(spark, s"$staging")
    }
    (ok, results)
  }

  /** The injected failure [[publishAudited]]'s `crashAfterStep` throws
    * — its own type so specs can intercept it without masking real
    * errors from the same code path. */
  final class CrashInjected(step: Int)
    extends RuntimeException(s"injected crash after step $step")

  /** `ALTER TABLE RENAME` plus the partitioned-table repair the
    * catalog does NOT do: renaming a PARTITIONED managed table moves
    * its directory but keeps every registered partition's location
    * pointing at the OLD path, so the renamed table silently reads as
    * EMPTY (found r11 — the retrain swap published an empty postings
    * table, and the r10 spec scored the empty index recall 1.0 ==
    * promised 1.0 vacuously). `MSCK REPAIR` re-registers partitions
    * from the moved directory: one metadata listing of the table dir,
    * paid only on publish/recovery renames. Every rename in the
    * publish/recover protocols must go through here. */
  private[graft] def renameTable(spark: SparkSession, from: String,
      to: String): Boolean = {
    val partitioned =
      spark.catalog.listColumns(from).collect().exists(_.isPartition)
    MetaOps.inc("rename_table")
    spark.sql(s"ALTER TABLE $from RENAME TO $to")
    if (partitioned) { MetaOps.inc("msck_repair")
      spark.sql(s"MSCK REPAIR TABLE $to"); () }
    partitioned
  }

  /** Crash repair for [[publishAudited]]: if a crash landed between
    * the rename-aside and the rename-in, the published name is gone
    * but the previous version survives as `<name>__prev` — restore it.
    * Idempotent; a no-op when `name` exists. Returns true if a
    * restore happened. */
  def recoverPrev(spark: SparkSession, name: String): Boolean = {
    val prev = name + "__prev"
    if (!spark.catalog.tableExists(name) &&
        spark.catalog.tableExists(prev)) {
      dropOrphanLocation(spark, name)
      renameTable(spark, prev, name)
      refresh(spark, name) // same staleness class as publish
      true
    } else false
  }

  /** Multi-TABLE write-audit-publish — the all-or-nothing release a
    * composed build needs (the dbt `build` promotion semantic: the
    * whole DAG ships or nothing does). [[publishAudited]] per table
    * cannot give that: if mart 2-of-2 fails its audit after mart 1
    * published, readers see a MIXED release — a new mart beside a
    * stale sibling it was built with. Here every table stages, every
    * staging is audited, and only if ALL pass does any swap happen;
    * a failing audit drops all stagings and every published table
    * keeps serving its previous version.
    *
    * The swap phase is still a sequence of per-table renames (a
    * catalog without multi-op transactions cannot make it one atomic
    * op), so a crash mid-swap can leave a mixed set on disk. The
    * protocol makes that window RECOVERABLE instead of silent:
    *
    *  1. create the `<setName>__swapping` marker table — ATOMICALLY
    *     (the catalog's create-if-absent is the mutex): a concurrent
    *     publisher, or a session racing an unrecovered crash, fails
    *     loudly HERE, before it can stage over anything;
    *  2. stage all `<name>__staging`;
    *  3. audit all (fail → drop stagings + marker, previous versions
    *     serve);
    *  4. per table: drop old `__prev`, rename name→prev,
    *     rename staging→name (prevs are KEPT until step 5 — unlike
    *     the single-table gate, rollback must stay possible until the
    *     whole set is in);
    *  5. drop all prevs, drop the marker.
    *
    * [[recoverSet]] inspects the states and rolls the set to ONE
    * generation: forward when every table already swapped (no
    * stagings remain under the marker), back otherwise. The marker
    * disambiguates the one otherwise-ambiguous state (a first-publish
    * table whose name exists with neither staging nor prev).
    *
    * Writer concurrency contract: ONE publisher per set name at a
    * time, enforced by the marker-as-mutex; losers of the race get an
    * IllegalStateException and must retry after the winner finishes
    * (or after `recoverSet` if the winner crashed). Readers are never
    * blocked — they see the previous generation until step 4 swaps
    * their table.
    *
    * `crashAfterSwap` is TEST-ONLY fault injection: k ∈ [0, n) throws
    * [[CrashInjected]] after table k's rename-in; k = n throws after
    * all swaps, before cleanup. */
  def publishSetAudited(setName: String,
      tables: Seq[(DataFrame, String, Seq[graft.quality.Check])],
      warnAsError: Boolean = false, crashAfterSwap: Int = -1)
      : (Boolean, Seq[(String, Seq[graft.quality.Quality.Result])]) =
    publishSetAuditedP(setName,
      tables.map { case (df, n, c) => (df, n, c, Option.empty[String]) },
      warnAsError, crashAfterSwap)

  /** [[publishSetAudited]] with per-table OPTIONAL partition layout:
    * a `Some(col)` table stages (and therefore publishes — the swap is
    * a metadata rename that keeps layout) PARTITIONED BY that column.
    * Needed when a member of an atomic set is partition-pruned by its
    * readers (e.g. an ANN postings table cell-partitioned for
    * `PartitionFilters` search pruning). */
  def publishSetAuditedP(setName: String,
      tables: Seq[(DataFrame, String, Seq[graft.quality.Check],
        Option[String])],
      warnAsError: Boolean = false, crashAfterSwap: Int = -1)
      : (Boolean, Seq[(String, Seq[graft.quality.Quality.Result])]) = {
    require(tables.nonEmpty, "empty publish set")
    val spark = tables.head._1.sparkSession
    val marker = s"${setName}__swapping"
    // marker-as-mutex, taken FIRST: the atomic catalog create is the
    // concurrency gate. A bare tableExists pre-check would leave a
    // TOCTOU window in which a second publisher stages over the
    // winner's stagings before either creates the marker.
    if (!spark.catalog.tableExists(marker))
      dropOrphanLocation(spark, marker)
    try spark.sql(s"CREATE TABLE $marker (committed INT) USING parquet")
    catch {
      case e: org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException =>
        throw new IllegalStateException(
          s"publish of $setName refused: marker $marker exists - " +
            "either a concurrent publisher holds it or a prior crash " +
            "was never recovered (run recoverSet first)", e)
    }
    tables.foreach { case (df, name, _, pc) =>
      pc match {
        case Some(c) => partitionedTable(df, s"${name}__staging", c)
        case None => table(df, s"${name}__staging")
      }
    }
    // ONE action audits every staged table's whole suite (the gate is
    // the action-count hot spot of every composed build that publishes
    // through it). A hidden NonEmpty leg per table rides the same
    // union — zero extra jobs — feeding the post-swap guard below.
    val counts = graft.quality.Quality.countsOnce(
      tables.map { case (_, name, checks, _) =>
        spark.table(s"${name}__staging") ->
          (checks :+ graft.quality.NonEmpty()) })
    val stagedNonEmpty = counts.map(_.last == 0L)
    val results = tables.zip(counts).map {
      case ((_, name, checks, _), cs) =>
        name -> graft.quality.Quality.resultsOf(checks, cs.init,
          warnAsError)
    }
    val ok = results.forall(_._2.forall(_.passed))
    if (!ok) {
      tables.foreach { case (_, name, _, _) =>
        dropTable(spark, s"${name}__staging") }
      spark.sql(s"DROP TABLE $marker")
      return (false, results)
    }
    tables.zipWithIndex.foreach { case ((_, name, _, _), i) =>
      val prev = s"${name}__prev"
      dropTable(spark, s"$prev")
      dropOrphanLocation(spark, prev)
      if (spark.catalog.tableExists(name))
        renameTable(spark, name, prev)
      dropOrphanLocation(spark, name)
      val renamedPartitioned =
        renameTable(spark, s"${name}__staging", name)
      refresh(spark, name) // the publish staleness class
      // audits ran on the STAGED files; a PARTITIONED rename is the
      // one step that can lose them (see publishAudited). One limit-1
      // probe, paid only for partitioned members, fails while __prev +
      // marker still exist so recoverSet rolls the whole set back.
      if (renamedPartitioned && stagedNonEmpty(i))
        require(!spark.table(name).isEmpty,
          s"publish of $name: staged rows lost in the swap")
      if (crashAfterSwap == i) throw new CrashInjected(i)
    }
    if (crashAfterSwap == tables.size)
      throw new CrashInjected(tables.size)
    tables.foreach { case (_, name, _, _) =>
      dropTable(spark, s"${name}__prev") }
    spark.sql(s"DROP TABLE $marker")
    (true, results)
  }

  /** Crash repair for [[publishSetAudited]]: rolls the WHOLE set to
    * one consistent generation. Marker absent → only staging debris
    * is possible (pre-swap crash or clean completion): drop it.
    * Marker present → if NO staging remains every table swapped:
    * roll FORWARD (finish the cleanup); otherwise roll BACK — unswapped
    * tables keep (or recover) their previous version and swapped
    * tables have their new version dropped and the previous restored.
    * Idempotent. Returns "forward", "back", or "noop". */
  def recoverSet(spark: SparkSession, setName: String,
      names: Seq[String]): String = {
    val marker = s"${setName}__swapping"
    def staging(n: String) = s"${n}__staging"
    def prev(n: String) = s"${n}__prev"
    if (!spark.catalog.tableExists(marker)) {
      val any = names.exists(n => spark.catalog.tableExists(staging(n)))
      names.foreach(n =>
        dropTable(spark, s"${staging(n)}"))
      return if (any) "back" else "noop"
    }
    val anyStaging = names.exists(n =>
      spark.catalog.tableExists(staging(n)))
    if (!anyStaging) {
      names.foreach(n => dropTable(spark, s"${prev(n)}"))
      dropTable(spark, s"$marker")
      "forward"
    } else {
      names.foreach { n =>
        if (spark.catalog.tableExists(staging(n))) {
          // not yet swapped: the previous version either still holds
          // the name or sits aside as __prev (crash between renames)
          if (!spark.catalog.tableExists(n) &&
              spark.catalog.tableExists(prev(n))) {
            dropOrphanLocation(spark, n)
            renameTable(spark, prev(n), n)
          }
          dropTable(spark, s"${staging(n)}")
        } else {
          // swapped: the name holds the NEW version — roll it back to
          // the kept prev (or to unpublished for a first release)
          dropTable(spark, s"$n")
          dropOrphanLocation(spark, n)
          if (spark.catalog.tableExists(prev(n)))
            renameTable(spark, prev(n), n)
        }
        if (spark.catalog.tableExists(n))
          refresh(spark, n) // publish staleness class
      }
      dropTable(spark, s"$marker")
      "back"
    }
  }
}
