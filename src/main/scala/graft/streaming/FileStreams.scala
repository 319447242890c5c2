package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** File-source Structured Streaming runs of the batch operators.
  *
  * The reference engine is batch-only (docs/README.md:463 advises against
  * rebuilding filters per-batch); this module is the Spark-native extension
  * that runs the SAME declarative pipelines incrementally: a parquet landing
  * directory is the source (`readStream`), watermarks bound state, and
  * `Trigger.AvailableNow` drains everything currently staged and stops —
  * which doubles as a deterministic batch-replay harness for the oracle
  * gates (CORRECTNESS `q_stream_*`).
  *
  * Determinism contract used by the gates: for an append-mode watermarked
  * aggregation drained from a SINGLE staged file (one data batch plus the
  * final no-data flush batch), the emitted set is exactly the batch result
  * restricted to groups whose event-time window END is at or before the
  * final watermark. Spark tracks the watermark in floored MILLISECONDS
  * (`EventTimeStatsAccum`), so the cutoff is
  * `end_us <= (floor(max_us / 1000) - delay_ms) * 1000`, and eviction is
  * inclusive (`end == watermark` emits). The same holds for any multi-file
  * split whose files arrive in event-time order (the production landing
  * shape); files arriving OUT of event-time order make earlier-window
  * events late, and the watermark drops them — correct streaming
  * semantics, pinned by FileStreamsSpec's out-of-order test. The contract
  * extends across QUERY RESTARTS: drains separated by a stop/start from
  * the same checkpoint (offsets + state + watermark restored) emit, in
  * union, exactly the single-drain set for in-event-time-order arrivals —
  * a window still open at an earlier drain's final watermark waits in the
  * restored state store and finalizes later with its full cross-drain
  * count (pinned by the two-drain restart spec).
  *
  * Scale shape: the landing directory pattern is the production shape — a
  * 1000-executor cluster streams new files incrementally, state in the
  * state store is bounded by the watermark horizon (not stream length), and
  * the parquet sink is just a distributed write per micro-batch. Nothing
  * below collects to the driver.
  */
object FileStreams {

  /** Harness-vs-operator cost split for the bench: a streaming gate's wall
    * time conflates landing-dir staging, schema footer reads, query
    * startup/checkpoint bootstrap and sink read-back (harness) with the
    * micro-batch execution itself (operator). [[runAvailableNow]] adds each
    * drain's summed `triggerExecution` duration (the engine's own per-batch
    * clock) here; `graft.Bench` snapshots the counter around every gate and
    * reports the operator share separately, so a regression in the actual
    * streaming operators is visible under the fixed ~per-gate harness cost.
    */
  private val operatorMsAcc = new java.util.concurrent.atomic.AtomicLong()
  def operatorMsSnapshot: Long = operatorMsAcc.get

  /** Normalize driver-generated parquet timestamp columns to session-zone
    * TIMESTAMP: `nanosCols` that arrived as raw nanos-since-epoch longs
    * (spark.sql.legacy.parquet.nanosAsLong=true) become microsecond
    * timestamps; any TIMESTAMP_NTZ column is cast in place (all sessions
    * here run UTC, so the cast is value-preserving). Shared by
    * [[graft.SparkEntry]]'s batch `prepare` and the streaming readers so
    * both sides see identical event time.
    */
  def normalizeTimestamps(df: DataFrame, nanosCols: Seq[String]): DataFrame = {
    val fixed = nanosCols.foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        // integer division: `/` on longs is DOUBLE division in Spark SQL,
        // and ~1.7e18 ns exceeds double's 53-bit mantissa
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
    fixed.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(fixed)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  /** Stage files into a fresh landing directory (symlinks — no copy).
    * `FileStreamSource` lists plain files in a directory — it neither
    * accepts a bare file path nor recurses into a symlinked table
    * DIRECTORY — so each entry is resolved to its part files first (the
    * driver's tables arrive as single files at small SFs and as parquet
    * directories from distributed writes). A landing directory is the
    * production ingestion shape anyway.
    */
  def stageLanding(files: Seq[Path]): Path = {
    val landing = Files.createTempDirectory("graft_landing_")
    val parts = files.flatMap { f =>
      if (Files.isDirectory(f))
        f.toFile.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).map(_.toPath)
      else Seq(f)
    }
    parts.zipWithIndex.foreach { case (f, i) =>
      Files.createSymbolicLink(landing.resolve(f"part_$i%05d.parquet"), f): Unit
    }
    landing.toFile.deleteOnExit()
    landing
  }

  /** Stream one driver table (`$sfDir/$table.parquet`) as a parquet file
    * stream with normalized event time. Schema comes from a batch footer
    * read (file streams need an explicit schema).
    */
  def tableStream(spark: SparkSession, sfDir: String, table: String,
      nanosCols: Seq[String] = Nil): DataFrame = {
    val path = Paths.get(s"$sfDir/$table.parquet")
    val schema = spark.read.parquet(path.toString).schema
    val landing = stageLanding(Seq(path))
    normalizeTimestamps(
      spark.readStream.schema(schema).parquet(landing.toString), nanosCols)
  }

  /** Run a streaming frame to a parquet sink under AvailableNow, block
    * until drained, and hand back the sink contents as a batch frame. By
    * default every call gets its own sink + checkpoint (reruns replay
    * from scratch); pass explicit `sinkDir`/`checkpointDir` to RESUME a
    * stopped query — the second drain restarts from the checkpointed
    * offsets + state (watermark included) and processes only files staged
    * since, appending to the same sink. For in-event-time-order arrivals
    * the union of emissions across drains equals the single-drain result
    * (spec-pinned, "two drains" case): a window still open at drain 1's
    * final watermark survives in the restored state store and finalizes
    * in drain 2 with its full cross-drain count.
    */
  /** Derived state-store backend (round 15, same derived-default
    * discipline as the LSH width / IVF nlist / SemDeDup k knobs): pick
    * RocksDB when the projected on-heap state no longer fits comfortably.
    *
    * The HDFS-backed provider holds every partition's full state map
    * on-heap — measured ~140 B/key at 50M distinct keys (~7 GB state,
    * SCALE.md round-14, where the default provider OOMs a 2 GB heap and
    * RocksDB completes at 308 MB) — and during snapshot commit briefly
    * holds map copies, all inside the same unified pool the query's
    * shuffles and aggregations need. The rule caps projected state at a
    * QUARTER of the executor heap: `expectedStateKeys * 140 > heap / 4`
    * -> `"rocksdb"`, else `"hdfs"`. At the r14 crossover this picks
    * RocksDB two decades before the OOM (50M keys projects 7 GB vs a
    * 0.5 GB budget on a 2 GB heap); watermark-bounded gates (thousands
    * of keys) stay on the cheaper on-heap provider.
    *
    * `heapBytes` defaults to this JVM's max heap — the executor IS the
    * driver in local mode; on a real cluster pass the executor heap.
    */
  def autoStateStoreChoice(expectedStateKeys: Long,
      heapBytes: Long = Runtime.getRuntime.maxMemory): String = {
    require(expectedStateKeys >= 0, "expectedStateKeys must be >= 0")
    require(heapBytes > 0, "heapBytes must be > 0")
    if (expectedStateKeys > heapBytes / 4 / StatePerKeyBytes) "rocksdb" else "hdfs"
  }

  /** Measured on-heap bytes per state key under the HDFS-backed provider
    * (50M keys ~> 7 GB, SCALE.md round-14 state-store crossover probe).
    */
  private[graft] val StatePerKeyBytes = 140L

  /** Derived state-partition count (round 16 — the
    * [[autoStateStoreChoice]] sibling the round-15 verdict asked for,
    * replacing the hardcoded `statePartitions = Some(4)` at every gate):
    * size the store count from projected STATE VOLUME, never from core
    * count.
    *
    * Why volume: every micro-batch pays a fixed commit (delta write +
    * fsync) PER STORE INSTANCE — a stream-stream join runs 4 stores x
    * partitions, and the commit floor is paid again on the no-data
    * finalize batch (probed round 15: stateCommit 2.3 s of a 3.8 s
    * trigger at 8 partitions). So partitions should be the MINIMUM that
    * keeps per-partition state comfortable, not the session's
    * batch-shuffle parallelism:
    *  - volume term: `ceil(keys * StatePerKeyBytes /
    *    targetBytesPerPartition)` — one store per ~64 MB of projected
    *    state, the guide-§2.2 "fewer, larger partitions" sizing applied
    *    to state stores (64 MB per-task state is trivially inside an
    *    executor's per-task memory share and amortizes its commit).
    *  - FLOOR [[MinStatePartitions]] = 4: below the volume knee the
    *    commit floor dominates and fewer is flatly better, but 4 keeps
    *    the per-batch state work off a single task; A/B'd at sf0.1
    *    (round 15): 2 ≈ 4 < 8 < 16 on watermark-bounded gate state.
    *  - CAP [[MaxStatePartitions]] = 32768: bounds the per-batch
    *    commit-file count and scheduler load; a state that large
    *    (>2 TB projected) should also be on RocksDB
    *    ([[autoStateStoreChoice]]) where per-partition state is
    *    disk-resident.
    *
    * `expectedStateKeys` is the caller's estimate of distinct state keys
    * (same parameter [[runAvailableNow]] feeds to the "auto" backend
    * choice); an upper bound such as the staged input's row count is fine
    * — the floor absorbs small-state over-estimates and the volume term
    * only engages when state is genuinely large.
    */
  def derivedStatePartitions(expectedStateKeys: Long,
      targetBytesPerPartition: Long = TargetStateBytesPerPartition,
      maxPartitions: Int = MaxStatePartitions): Int = {
    require(expectedStateKeys >= 0, "expectedStateKeys must be >= 0")
    require(targetBytesPerPartition > 0, "targetBytesPerPartition must be > 0")
    require(maxPartitions >= MinStatePartitions,
      s"maxPartitions must be >= $MinStatePartitions")
    val fromVolume = math.ceil(
      expectedStateKeys.toDouble * StatePerKeyBytes / targetBytesPerPartition)
    math.max(MinStatePartitions.toDouble,
      math.min(maxPartitions.toDouble, fromVolume)).toInt
  }

  /** See [[derivedStatePartitions]]. */
  private[graft] val MinStatePartitions = 4
  private[graft] val MaxStatePartitions = 32768
  private[graft] val TargetStateBytesPerPartition = 64L << 20

  /** Total row count of a parquet file/directory from its FOOTERS — a
    * metadata-only read (no Spark job, no data pages), the statistic a
    * production pipeline takes from its catalog. Used by the streaming
    * gates as the upper-bound `expectedStateKeys` estimate: dedup state
    * <= distinct keys <= rows, join buffers <= rows inside the watermark
    * horizon, window state <= rows.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Seq(p)
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** [[parquetRowCount]] over a driver table (`$sfDir/$table.parquet`). */
  def tableRowCount(spark: SparkSession, sfDir: String, table: String): Long =
    parquetRowCount(spark, s"$sfDir/$table.parquet")

  def runAvailableNow(stream: DataFrame,
      mode: OutputMode = OutputMode.Append,
      sinkDir: Option[Path] = None,
      checkpointDir: Option[Path] = None,
      statePartitions: Option[Int] = None,
      stateStore: Option[String] = None,
      expectedStateKeys: Long = -1L): DataFrame = {
    val spark = stream.sparkSession
    // State-store BACKEND: the default HDFS-backed provider holds every
    // partition's full state map ON-HEAP (disk is only the commit log), so
    // executor heap must scale with the key universe — fine for the
    // watermark-bounded gates here, wrong for the 100 TB streaming shape
    // (dedup/session key universes >> heap). "rocksdb" switches the query
    // to RocksDBStateStoreProvider: state lives off-heap/on-disk per
    // partition with a block-cache working set, heap stays O(cache), and
    // changelog/snapshot files still ride the same checkpoint location.
    // Like `statePartitions`, the provider is pinned by the FIRST
    // checkpoint (offset-log metadata) — pass it on the first drain; a
    // resume under a different provider refuses rather than corrupts.
    // Resolution: explicit param > session conf `graft.streaming.stateStore`
    // (lets a pipeline/Verify run flip EVERY streaming query to RocksDB
    // without threading the knob through each call) > engine default.
    // CONCURRENCY CAVEAT: the override is the session-global provider key,
    // set for this drain and restored in the finally — a streaming query
    // STARTED concurrently on the same SparkSession during the drain would
    // capture the temporary value and freeze it into its own checkpoint.
    // This helper assumes the session starts one streaming query at a time
    // (Spark offers no per-query provider option to scope it tighter).
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val requested = stateStore.orElse(spark.conf.getOption("graft.streaming.stateStore"))
    val prevProvider = requested.map { s =>
      // "auto" derives the backend from the caller's distinct-state-key
      // estimate ([[autoStateStoreChoice]]). Without an estimate it keeps
      // the on-heap provider: every helper here is watermark-BOUNDED
      // state (thousands of keys), the regime where hdfs wins — but a
      // pipeline streaming an UNBOUNDED key universe (full-corpus dedup)
      // must pass `expectedStateKeys`, or the choice that matters most at
      // 100 TB silently defaults into the provider that OOMs there.
      val resolved = if (s.equalsIgnoreCase("auto")) {
        if (expectedStateKeys >= 0) autoStateStoreChoice(expectedStateKeys)
        else "hdfs"
      } else s
      val cls = resolved.toLowerCase match {
        case "rocksdb" =>
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        case "hdfs" =>
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        case other => throw new IllegalArgumentException(
          s"stateStore must be 'hdfs', 'rocksdb' or 'auto', got '$other'")
      }
      val old = spark.conf.getOption(providerConf)
      spark.conf.set(providerConf, cls)
      old
    }
    // State-partition sizing: a stateful streaming query FREEZES its state
    // partition count at the first checkpoint (it rides the offset-log
    // metadata; later conf changes are ignored on resume), and every
    // micro-batch pays a per-partition state-store commit for EVERY
    // stateful operator — a stream-stream join commits four stores per
    // partition per batch. Inheriting the session's batch-oriented
    // shuffle.partitions therefore sets a permanent per-batch floor that
    // has nothing to do with state volume. `statePartitions` sizes it
    // explicitly at query start (state is keyed small-state here:
    // watermark-bounded windows/joins hold thousands of keys, not rows);
    // with no explicit count, a caller-supplied `expectedStateKeys`
    // estimate derives it ([[derivedStatePartitions]] — volume-sized,
    // floor 4, the same estimate that drives the "auto" backend choice);
    // None + no estimate keeps the session default. Only meaningful for a
    // FRESH checkpoint — on resume the checkpointed count wins, by design.
    val effectiveStatePartitions = statePartitions.orElse(
      if (expectedStateKeys >= 0) Some(derivedStatePartitions(expectedStateKeys))
      else None)
    val prevShuffle = effectiveStatePartitions.map { n =>
      require(n > 0, s"statePartitions must be positive, got $n")
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      old
    }
    // deleteOnExit ONLY on directories this call created — a caller's
    // persistent sink/checkpoint location is theirs, not ours to delete
    val out = sinkDir.getOrElse {
      val d = Files.createTempDirectory("graft_sink_"); d.toFile.deleteOnExit(); d
    }
    val ck = checkpointDir.getOrElse {
      val d = Files.createTempDirectory("graft_ck_"); d.toFile.deleteOnExit(); d
    }
    val q = try {
      val started = stream.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ck.toString)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      started.awaitTermination()
      started
    } finally {
      prevShuffle.foreach(old =>
        spark.conf.set("spark.sql.shuffle.partitions", old))
      prevProvider.foreach {
        case Some(old) => spark.conf.set(providerConf, old)
        case None => spark.conf.unset(providerConf)
      }
    }
    // operator-cost meter: the engine's own per-batch triggerExecution
    // clock, summed over this drain (AvailableNow drains stay far under the
    // recentProgress retention cap)
    operatorMsAcc.addAndGet(q.recentProgress.iterator.map { p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    }.sum): Unit
    spark.read.parquet(out.toString)
  }

  /** Daily event counts per type, finalized by the watermark — the
    * streaming twin of the batch `window()` aggregation. Emits
    * `(w_us, event_type, n)` with the window start as epoch micros.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String, typeCol: String,
      windowExpr: String = "1 day", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowExpr), col(typeCol))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(unix_micros(col("window.start")).as("w_us"), col(typeCol), col("n"))

  /** Per-window top-k heavy hitters — CHAINED stateful aggregations in
    * one append-mode query (the Spark 3.5+ multiple-stateful-operator
    * shape): the first watermarked aggregation counts per (event-time
    * window, key); the second, grouped on `window(window)` (the
    * window-of-window pattern), folds those finalized counts through the
    * bounded-heap `topk_agg` — so the per-window state the SECOND
    * operator holds is ≤ k entries, not the key universe, and no
    * per-window sort ever runs. Emission inherits the
    * [[windowedEventCounts]] contract: a window's top-k appears exactly
    * once, when the watermark closes it.
    *
    * The streaming face of the batch `topk_agg` gate: identical ranking
    * semantics (ord = count descending, ties to the smaller key), so the
    * oracle replays counts + `row_number` per closed window.
    *
    * @return (w_us, rank, key, n)
    */
  def windowedTopK(events: DataFrame, tsCol: String, keyCol: String, k: Int,
      windowExpr: String = "1 day", watermark: String = "1 hour"): DataFrame = {
    import graft.operators.ColumnBridge
    // fail fast on non-integral keys: a string key would cast to NULL
    // silently and vanish from every ranking
    events.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"windowedTopK key column $keyCol must be integral (topk_agg payload is BIGINT), got $other")
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowExpr), col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"))
      .groupBy(window(col("window"), windowExpr).as("w2"))
      .agg(ColumnBridge.column(graft.functions.TopKAgg(
        ColumnBridge.expression(lit(k)),
        ColumnBridge.expression(col("n")),
        ColumnBridge.expression(col(keyCol).cast("long"))).toAggregateExpression())
        .as("__tk"))
      .select(unix_micros(col("w2.start")).as("w_us"),
        posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("w_us"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.payload").as(keyCol), col("__e.ord").as("n"))
  }

  /** Per-window value histogram — the streaming drift monitor: each
    * event-time window folds its values through the mergeable
    * [[graft.functions.HistSketchAgg]] (per-window state = nbins+2
    * longs, never rows) and emits its non-empty (slot, n) bins when the
    * watermark closes it. Feed consecutive windows to
    * [[graft.operators.Profile.histDrift]]-style PSI/TVD comparison for
    * ingest drift alarms. Slot layout is the sketch's: 0 = underflow,
    * 1..nbins in-range, nbins+1 = overflow. Emission inherits the
    * [[windowedEventCounts]] contract.
    *
    * @return (w_us, slot, n) — zero bins omitted
    */
  def windowedHistogram(events: DataFrame, tsCol: String, valueCol: String,
      nbins: Int, lo: Double, hi: Double,
      windowExpr: String = "1 day", watermark: String = "1 hour"): DataFrame = {
    // fail fast at plan construction (the sibling windowedTopK
    // discipline) — not as a wrapped SparkException inside a micro-batch
    require(nbins >= 1, s"nbins must be >= 1, got $nbins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    import graft.operators.ColumnBridge
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowExpr))
      .agg(ColumnBridge.column(graft.functions.HistCounts(ColumnBridge.expression(
        ColumnBridge.column(graft.functions.HistSketchAgg(
          ColumnBridge.expression(lit(nbins)), ColumnBridge.expression(lit(lo)),
          ColumnBridge.expression(lit(hi)),
          ColumnBridge.expression(col(valueCol).cast("double"))).toAggregateExpression()))))
        .as("__c"))
      .select(unix_micros(col("window.start")).as("w_us"),
        posexplode(col("__c")).as(Seq("slot", "n")))
      .where(col("n") > 0)
  }

  /** Stream-static enrichment + windowed rollup: each micro-batch joins
    * the event stream against a STATIC dimension (broadcast — the classic
    * "enrich the firehose with reference data" pattern; Spark re-reads the
    * static side per batch, so slowly-updated dimension tables are picked
    * up without restarting the query), then aggregates per (event-time
    * window, dimension attribute) under the watermark. Value sums are
    * micro-rounded per row BEFORE summing, so emitted integers replay
    * exactly in any engine. Same emission contract as
    * [[windowedEventCounts]] (append mode, ms-floored watermark,
    * inclusive eviction).
    */
  def enrichedWindowedStats(events: DataFrame, tsCol: String, valueCol: String,
      keyCol: String, dim: DataFrame, dimKeyCol: String, dimAttrCol: String,
      windowExpr: String = "1 day", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .join(broadcast(dim.select(col(dimKeyCol).cast("long").as(keyCol),
        col(dimAttrCol).as("segment"))), Seq(keyCol))
      .groupBy(window(col(tsCol), windowExpr), col("segment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round(col(valueCol) * 100).cast("long")).cast("long").as("value_e2"))
      .select(unix_micros(col("window.start")).as("w_us"), col("segment"),
        col("n"), col("value_e2"))

  /** Stream-stream interval self-join: pair each left-type event with the
    * same user's right-type events inside `[t, t + windowUs]` — the
    * attribution/conversion-pairing pattern as a REAL watermarked
    * stream-stream inner join (both sides carry watermarks so Spark can
    * bound the join state; the range condition gives the state its
    * eviction horizon). Under a single AvailableNow drain the emitted set
    * is exactly the batch interval join — inner-join rows emit as soon as
    * both sides are present, with no watermark cutoff on OUTPUT (unlike
    * the aggregation gates) — which is the emission contract the gate's
    * oracle replays.
    *
    * @return (user key, left ts, right ts, dt_us) per matched pair
    */
  def streamIntervalJoin(events: DataFrame, tsCol: String, typeCol: String,
      keyCol: String, leftType: String, rightType: String, windowUs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = events.where(col(typeCol) === leftType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__lts"))
      .withWatermark("__lts", watermark)
    val r = events.where(col(typeCol) === rightType)
      .select(col(keyCol).as("__rk"), col(tsCol).as("__rts"))
      .withWatermark("__rts", watermark)
    // the range must be expressed as event-time bounds on the timestamp
    // columns themselves so Spark derives the join-state eviction horizon
    l.join(r, col("__k") === col("__rk") &&
        expr(s"__rts >= __lts AND __rts <= __lts + INTERVAL $windowUs MICROSECOND"))
      .select(col("__k").as(keyCol),
        unix_micros(col("__lts")).as("l_us"),
        unix_micros(col("__rts")).as("r_us"),
        (unix_micros(col("__rts")) - unix_micros(col("__lts"))).as("dt_us"))
  }

  /** LEFT-OUTER variant of [[streamIntervalJoin]]: every left-type event
    * emits — matched pairs as they meet, and a NULL-extended row for a
    * left event whose match window expires unmatched (the "view with no
    * conversion" attribution row, produced INSIDE the stream instead of
    * by a daily batch anti-join).
    *
    * Emission contract under a single AvailableNow drain (spec-pinned):
    * matched pairs equal the batch inner join (no cutoff); NULL-extended
    * rows are exactly the unmatched left events whose state expired at
    * the final GLOBAL watermark. Each `withWatermark` node tracks its OWN
    * filtered stream, and the query's watermark is their MIN — so with
    * per-side maxima maxL/maxR the cutoff is `l_us + windowUs <
    * (min(floor(maxL_us/1000), floor(maxR_us/1000)) − delay_ms) · 1000`
    * (strict; ms-floored per side). In particular a left side whose
    * events run PAST the right side's last event does not advance
    * eviction beyond the right side's horizon. Unmatched left events
    * still inside the horizon emit NOTHING yet — they are open state, not
    * output; a later drain from the same checkpoint finalizes them.
    *
    * @return (user key, l_us, r_us NULL for expired-unmatched, dt_us NULL
    *         likewise)
    */
  def streamIntervalJoinOuter(events: DataFrame, tsCol: String, typeCol: String,
      keyCol: String, leftType: String, rightType: String, windowUs: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = events.where(col(typeCol) === leftType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__lts"))
      .withWatermark("__lts", watermark)
    val r = events.where(col(typeCol) === rightType)
      .select(col(keyCol).as("__rk"), col(tsCol).as("__rts"))
      .withWatermark("__rts", watermark)
    l.join(r, col("__k") === col("__rk") &&
        expr(s"__rts >= __lts AND __rts <= __lts + INTERVAL $windowUs MICROSECOND"),
        "left_outer")
      .select(col("__k").as(keyCol),
        unix_micros(col("__lts")).as("l_us"),
        unix_micros(col("__rts")).as("r_us"),
        (unix_micros(col("__rts")) - unix_micros(col("__lts"))).as("dt_us"))
  }

  /** Streaming exact dedup: first sighting of each (source, fingerprint)
    * passes, later ones are dropped by the state store — `dropDuplicates`
    * state is the exact-dedup twin of
    * [[StreamingFilters.approximateDedupStream]]'s bounded-bloom state.
    * The emitted SET is deterministic (which duplicate row wins a race is
    * not, so callers that need determinism project the key columns only).
    */
  def distinctKeys(rows: DataFrame, keyCols: Seq[String]): DataFrame =
    rows.select(keyCols.map(col): _*).dropDuplicates(keyCols)

  /** Watermark-BOUNDED streaming dedup — the production variant of
    * [[distinctKeys]], whose `dropDuplicates` state grows with the
    * all-time distinct-key count. Here a key's state entry is dropped
    * once the event-time watermark passes it
    * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
    * watermark delay of the first sighting are removed, a re-occurrence
    * AFTER the horizon passes again — the right trade for endless streams
    * (dedup "the same event delivered twice this hour", not "ever").
    * State is watermark-horizon-sized, not stream-lifetime-sized.
    *
    * Emitted set under one drain, in-event-time-order arrivals, for keys
    * whose duplicates all fall within `delay` of the first sighting:
    * exactly the batch first-sighting set (spec-pinned); only duplicates
    * separated by more than the watermark horizon re-emit. As with
    * [[distinctKeys]], the emitted KEY set is deterministic but WHICH
    * duplicate row's `tsCol` survives a within-batch race is not —
    * determinism-sensitive callers project the key columns only.
    */
  def distinctKeysWithinWatermark(rows: DataFrame, tsCol: String,
      keyCols: Seq[String], delay: String): DataFrame =
    rows.select((keyCols.map(col) :+ col(tsCol)): _*)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
