package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the determinism contract the `q_stream_*` CORRECTNESS gates rely
  * on (FileStreams scaladoc): after an AvailableNow drain, the emitted set
  * of an append-mode watermarked aggregation equals the batch result
  * restricted to windows with `end_us <= (floor(max_us/1000) - delay_ms) *
  * 1000`, for ANY micro-batch split; eviction fires at `end == watermark`
  * (inclusive); `session_window` merges events exactly `gap` apart (the
  * same `diff > gap` break rule as the batch sessionizer).
  */
class FileStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-filestreams-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def batchEvents(): DataFrame =
    FileStreams.normalizeTimestamps(
      spark.read.parquet(s"$dir/events.parquet"), Seq("ts"))

  /** The contract cutoff: final watermark in micros, ms-floored. */
  private def watermarkUs(ev: DataFrame, delayMs: Long): Long =
    (ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) / 1000 - delayMs) * 1000

  test("windowed counts: emitted set == batch result under the ms-floored cutoff") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val out = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(ev, "ts", "event_type", "1 day", "1 hour"))
    val batch = batchEvents()
    val wm = watermarkUs(batch, 3600000L)
    val expected = batch
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(unix_micros(col("window.start")).as("w_us"), col("event_type"), col("n"))
      .filter(col("w_us") + 86400000000L <= wm)
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.count() > 0)
  }

  test("windowed top-k: chained stateful aggs == batch counts + rank under the cutoff") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val out = FileStreams.runAvailableNow(
      FileStreams.windowedTopK(ev, "ts", "user_id", k = 5, "1 day", "1 hour"))
    val batch = batchEvents()
    val wm = watermarkUs(batch, 3600000L)
    val counts = batch
      .groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(unix_micros(col("window.start")).as("w_us"), col("user_id"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("w_us").orderBy(col("n").desc, col("user_id"))
    val expected = counts
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 5 && col("w_us") + 86400000000L <= wm)
      .select(col("w_us"), col("rank"), col("user_id").cast("long"), col("n"))
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.count() > 0)
    // each closed window emits its top-k exactly once, ranks dense 1..k
    val ranks = out.groupBy("w_us").agg(collect_list("rank").as("rs"))
      .collect().map(_.getSeq[Int](1).sorted)
    assert(ranks.forall(rs => rs == (1 to rs.size)), ranks.mkString(";"))
  }

  test("windowed histogram: emitted bins == batch sketch under the cutoff, zeros absent") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
      .withColumn("x", round(col("value") * 100).cast("long").cast("double"))
    val out = FileStreams.runAvailableNow(
      FileStreams.windowedHistogram(ev, "ts", "x", 50, 0.0, 50000.0, "1 day", "1 hour"))
    val batch = batchEvents()
      .withColumn("x", round(col("value") * 100).cast("long").cast("double"))
    val wm = watermarkUs(batch, 3600000L)
    val expected = batch
      .select(unix_micros(date_trunc("DAY", col("ts"))).as("w_us"),
        when(col("x") < 0.0, 0)
          .when(col("x") >= 50000.0, 51)
          .otherwise(lit(1) + least(lit(49), floor(col("x") / 1000.0).cast("int")))
          .as("slot"))
      .groupBy("w_us", "slot").agg(count(lit(1)).as("n"))
      .where(col("w_us") + 86400000000L <= wm)
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.count() > 0 && out.where(col("n") <= 0).count() == 0)
  }

  test("stream-static enrichment: emitted set == batch join+rollup under the cutoff") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val dim = spark.read.parquet(s"$dir/customer.parquet")
    val out = FileStreams.runAvailableNow(
      FileStreams.enrichedWindowedStats(ev, "ts", "value", "user_id",
        dim, "c_custkey", "c_mktsegment"))
    val batch = batchEvents()
    val wm = watermarkUs(batch, 3600000L)
    val expected = batch
      .join(dim.select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment").as("segment")), Seq("user_id"))
      .groupBy(window(col("ts"), "1 day"), col("segment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round(col("value") * 100).cast("long")).cast("long").as("value_e2"))
      .select(unix_micros(col("window.start")).as("w_us"), col("segment"),
        col("n"), col("value_e2"))
      .filter(col("w_us") + 86400000000L <= wm)
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.count() > 0)
  }

  test("stream-stream interval join: emitted pairs == batch interval join") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val out = FileStreams.runAvailableNow(
      FileStreams.streamIntervalJoin(ev, "ts", "event_type", "user_id",
        "view", "purchase", 3600000000L))
    val batch = batchEvents()
    val a = batch.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("lts"))
    val b = batch.where(col("event_type") === "purchase")
      .select(col("user_id").as("rk"), col("ts").as("rts"))
    val expected = a.join(b, col("user_id") === col("rk") &&
        col("rts") >= col("lts") &&
        unix_micros(col("rts")) <= unix_micros(col("lts")) + 3600000000L)
      .select(col("user_id"), unix_micros(col("lts")).as("l_us"),
        unix_micros(col("rts")).as("r_us"),
        (unix_micros(col("rts")) - unix_micros(col("lts"))).as("dt_us"))
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    assert(out.count() > 0)
  }

  test("emitted set is identical under an event-time-ordered one-file-per-trigger split") {
    val batch = batchEvents()
    // re-stage the table as 3 event-time-ranged files (the production
    // landing shape: files arrive in rough event-time order) and drain one
    // file per micro-batch: three data batches, three intermediate
    // watermarks, same final emitted set
    val staged = java.nio.file.Files.createTempDirectory("graft_split_")
    batch.repartitionByRange(3, col("ts")).write.mode("overwrite").parquet(staged.toString)
    // FileStreamSource orders by modification time — make arrival order
    // explicit: part-00000 (earliest ts range) lands first
    val parts = staged.toFile.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(1000000000000L + i * 60000L): Unit }
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false").parquet(staged.toString)
    val out = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(src, "ts", "event_type", "1 day", "1 hour"))
    val single = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "1 day", "1 hour"))
    assert(out.collect().map(_.toSeq).toSet == single.collect().map(_.toSeq).toSet)
  }

  test("left-outer interval join: matches == batch inner, nulls == expired unmatched") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val win = 1800000000L
    val out = FileStreams.runAvailableNow(
      FileStreams.streamIntervalJoinOuter(
        ev, "ts", "event_type", "user_id", "view", "click", win))
    val batch = batchEvents()
    val l = batch.where(col("event_type") === "view")
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("lus"))
    val r = batch.where(col("event_type") === "click")
      .select(col("user_id").as("rk"), unix_micros(col("ts")).as("rus"))
    // the GLOBAL watermark is the min over the two per-side watermark
    // nodes (each sees only its filtered stream, ms-floored)
    val wm = math.min(
      watermarkUs(batch.where(col("event_type") === "view"), 3600000L),
      watermarkUs(batch.where(col("event_type") === "click"), 3600000L))
    val matched = l.join(r, col("k") === col("rk") &&
        col("rus") >= col("lus") && col("rus") <= col("lus") + win)
      .select(col("k"), col("lus"), col("rus"))
      .collect().map(_.toSeq).toSet
    val gotMatched = out.where(col("r_us").isNotNull)
      .select(col("user_id"), col("l_us"), col("r_us"))
      .collect().map(_.toSeq).toSet
    assert(gotMatched == matched, "matched pairs != batch inner join")
    // NULL-extended rows: unmatched left events whose window expired
    // strictly before the final watermark
    val unmatched = l.join(r, col("k") === col("rk") &&
        col("rus") >= col("lus") && col("rus") <= col("lus") + win, "left_anti")
      .where(col("lus") + win < wm)
      .select(col("k"), col("lus"))
      .collect().map(_.toSeq).toSet
    val gotNulls = out.where(col("r_us").isNull)
      .select(col("user_id"), col("l_us"))
      .collect().map(_.toSeq).toSet
    assert(gotNulls == unmatched,
      s"null-extension cutoff drifted: missing ${unmatched -- gotNulls}, extra ${gotNulls -- unmatched}")
    assert(gotNulls.nonEmpty && gotMatched.nonEmpty)
  }

  test("outer join watermark is the MIN of the per-side nodes (ms-floored each)") {
    val sps = spark; import sps.implicits._
    // views at 0..120 min (5-min steps), one click at 200 min; win 30 min,
    // delay 10 min. Overall-max watermark (190 min) would evict every
    // view; the VIEW side's own watermark is 120 − 10 = 110 min, so only
    // views with lts + 30 < 110, i.e. lts <= 75 min, may emit nulls.
    val base = 1700000000000000L
    val minUs = 60000000L
    val rows = (0 to 24).map(i => (i.toLong, "view", base + i * 5 * minUs)) :+
      (999L, "click", base + 200 * minUs)
    val df = rows.toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val staged = java.nio.file.Files.createTempDirectory("graft_minwm_")
    df.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val src = spark.readStream.schema(
      spark.read.parquet(staged.toString).schema).parquet(staged.toString)
    val out = FileStreams.runAvailableNow(
      FileStreams.streamIntervalJoinOuter(
        src, "ts", "event_type", "user_id", "view", "click", 30 * minUs,
        watermark = "10 minutes"))
    val emitted = out.where(col("r_us").isNull).select("user_id")
      .collect().map(_.getLong(0)).toSet
    assert(emitted == (0L to 15L).toSet,
      s"min-watermark eviction drifted: got ${emitted.toSeq.sorted}")
  }

  // The three restart specs run under BOTH state-store backends: the
  // HDFS-backed default and RocksDB (the 100 TB path — state off-heap, see
  // runAvailableNow). Restart-resume is the behavior most sensitive to a
  // provider swap (state survives through provider snapshot/changelog
  // files), and each spec's final union == single-drain assertion compares
  // the named provider against a DEFAULT-provider single drain — so it is
  // also a cross-provider equality check.
  for (provider <- Seq("hdfs", "rocksdb"))
  test(s"two drains with a checkpoint restart: union of emissions == single drain [$provider]") {
    val batch = batchEvents()
    // production landing shape: batch 1 lands, the query drains and STOPS;
    // batch 2 (later event times) lands after a restart from the same
    // checkpoint — the emitted union must equal one big drain
    val staged = java.nio.file.Files.createTempDirectory("graft_twodrain_stage_")
    batch.repartitionByRange(2, col("ts")).write.mode("overwrite").parquet(staged.toString)
    val parts = staged.toFile.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 2)
    val landing = java.nio.file.Files.createTempDirectory("graft_twodrain_landing_")
    val sink = java.nio.file.Files.createTempDirectory("graft_twodrain_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_twodrain_ck_")
    def drain(): DataFrame = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        spark.readStream.schema(batch.schema).parquet(landing.toString),
        "ts", "event_type", "1 day", "1 hour"),
      sinkDir = Some(sink), checkpointDir = Some(ck), stateStore = Some(provider))
    // drain 1: only the earlier event-time file is staged
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00000.parquet"), parts(0).toPath): Unit
    val first = drain().collect().map(_.toSeq).toSet
    // drain 2: the later file arrives; restart resumes offsets + state
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00001.parquet"), parts(1).toPath): Unit
    val union = drain().collect().map(_.toSeq).toSet
    assert(first.subsetOf(union), "a drain-1 emission vanished from the sink")
    assert(union.size > first.size, "drain 2 emitted nothing — restart did not resume")
    val single = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "1 day", "1 hour"))
      .collect().map(_.toSeq).toSet
    assert(union == single,
      s"two-drain union != single drain: missing ${single -- union}, extra ${union -- single}")
  }

  for (provider <- Seq("hdfs", "rocksdb"))
  test(s"windowed top-k restart: two drains finalize the same windows as one [$provider]") {
    // the chained stateful aggs (count state + rank state) must carry
    // cross-batch: windows whose events SPAN the restart may only close —
    // and emit their top-k exactly once — after the second drain's
    // watermark passes them
    val batch = batchEvents()
    val staged = java.nio.file.Files.createTempDirectory("graft_topk_stage_")
    batch.repartitionByRange(2, col("ts")).write.mode("overwrite").parquet(staged.toString)
    val parts = staged.toFile.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 2)
    val landing = java.nio.file.Files.createTempDirectory("graft_topk_landing_")
    val sink = java.nio.file.Files.createTempDirectory("graft_topk_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_topk_ck_")
    def drain(): DataFrame = FileStreams.runAvailableNow(
      FileStreams.windowedTopK(
        spark.readStream.schema(batch.schema).parquet(landing.toString),
        "ts", "user_id", k = 5, "1 day", "1 hour"),
      sinkDir = Some(sink), checkpointDir = Some(ck), stateStore = Some(provider))
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00000.parquet"), parts(0).toPath): Unit
    val first = drain().collect().map(_.toSeq).toSet
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00001.parquet"), parts(1).toPath): Unit
    val unionDf = drain()
    val union = unionDf.collect().map(_.toSeq).toSet
    // no window's top-k emitted twice (set size == row count)
    assert(unionDf.count() == union.size, "a closed window re-emitted after restart")
    assert(first.subsetOf(union) && union.size > first.size)
    val single = FileStreams.runAvailableNow(
      FileStreams.windowedTopK(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "user_id", k = 5, "1 day", "1 hour"))
      .collect().map(_.toSeq).toSet
    assert(union == single,
      s"top-k two-drain union != single drain: missing ${single -- union}, extra ${union -- single}")
  }

  for (provider <- Seq("hdfs", "rocksdb"))
  test(s"outer interval join restart: expired-unmatched state finalizes across drains [$provider]") {
    // cross-batch join-state eviction: a view whose 30-min window is still
    // open at drain 1's watermark is STATE (no output); drain 2 must
    // either match it or finalize it NULL-extended — and never twice. The
    // two-drain union must equal the single drain row for row.
    val batch = batchEvents()
    val staged = java.nio.file.Files.createTempDirectory("graft_oj_stage_")
    batch.repartitionByRange(2, col("ts")).write.mode("overwrite").parquet(staged.toString)
    val parts = staged.toFile.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val landing = java.nio.file.Files.createTempDirectory("graft_oj_landing_")
    val sink = java.nio.file.Files.createTempDirectory("graft_oj_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_oj_ck_")
    def drain(): DataFrame = FileStreams.runAvailableNow(
      FileStreams.streamIntervalJoinOuter(
        spark.readStream.schema(batch.schema).parquet(landing.toString),
        "ts", "event_type", "user_id", "view", "click", 1800000000L),
      sinkDir = Some(sink), checkpointDir = Some(ck), stateStore = Some(provider))
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00000.parquet"), parts(0).toPath): Unit
    val firstDf = drain()
    val first = firstDf.collect().map(_.toSeq)
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("part_00001.parquet"), parts(1).toPath): Unit
    val unionRows = drain().collect().map(_.toSeq)
    val union = unionRows.toSet
    assert(unionRows.length == union.size, "a join row re-emitted after restart")
    assert(first.toSet.subsetOf(union) && union.size > first.length)
    val singleRows = FileStreams.runAvailableNow(
      FileStreams.streamIntervalJoinOuter(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "user_id", "view", "click", 1800000000L))
      .collect().map(_.toSeq)
    val single = singleRows.toSet
    assert(union == single,
      s"outer-join two-drain union != single drain: missing ${(single -- union).take(3)}, " +
        s"extra ${(union -- single).take(3)}")
    // both paths emitted real NULL-extended rows (the eviction under test)
    assert(union.exists(r => r(2) == null), "no expired-unmatched rows — eviction untested")
  }

  test("out-of-order file arrival drops late windows (watermark semantics, not a bug)") {
    val batch = batchEvents()
    // randomly split files span the whole time range: after the first
    // micro-batch the watermark jumps to near-max, so most events in later
    // files are late and dropped — the emitted counts are a strict subset
    val staged = java.nio.file.Files.createTempDirectory("graft_ooo_")
    batch.repartition(3).write.mode("overwrite").parquet(staged.toString)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val out = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(src, "ts", "event_type", "1 day", "1 hour"))
    val single = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "1 day", "1 hour"))
    val outTotal = out.agg(sum("n")).collect()(0).getLong(0)
    val singleTotal = single.agg(sum("n")).collect()(0).getLong(0)
    assert(outTotal < singleTotal, s"$outTotal vs $singleTotal")
  }

  test("session rollup: emitted sessions == batch session_window under the cutoff") {
    val ev = FileStreams.tableStream(spark, dir, "events", Seq("ts"))
    val out = FileStreams.runAvailableNow(
      StreamingSessions.streamingSessionStats(
        ev, "user_id", "ts", gap = "30 minutes", watermark = "1 hour"))
      .select(col("user_id"), unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"), col("n_events"))
    val batch = batchEvents()
    val wm = watermarkUs(batch, 3600000L)
    val expected = batch
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"), col("n_events"))
      .filter(col("e_us") <= wm)
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
    // and batch session_window agrees with the window-function sessionizer
    // on session count (ends differ by +gap by construction)
    val viaFn = graft.operators.Events.sessionStats(
      graft.operators.Events.sessionize(batch, "user_id", "ts", gapSeconds = 1800),
      "user_id")
    assert(expected.count() <= viaFn.count())
  }

  test("eviction is inclusive: a window ending exactly at the watermark is emitted") {
    val sps = spark; import sps.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[java.sql.Timestamp]
    val agg = input.toDF().toDF("ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
    val q = agg.writeStream.format("memory").queryName("tie_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(java.sql.Timestamp.valueOf("2024-01-01 10:30:00"))
      q.processAllAvailable()
      // watermark is now exactly 11:00:00.000 == end of window [10:00, 11:00)
      input.addData(java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
      q.processAllAvailable()
      val emitted = spark.table("tie_stream").collect().map(_.getString(0)).toSet
      assert(emitted.contains("2024-01-01 10:00:00"), emitted.toString)
    } finally q.stop()
  }

  test("session_window merges events exactly gap apart (diff > gap breaks)") {
    val sps = spark; import sps.implicits._
    val twoAtGap = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"))).toDF("user_id", "ts")
    assert(twoAtGap.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1))).count() == 1L)
    val pastGap = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00.000001"))).toDF("user_id", "ts")
    assert(pastGap.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1))).count() == 2L)
  }

  test("watermarked dedup: drop within horizon, re-emit after it, bounded state") {
    val sps = spark; import sps.implicits._
    val base = 1700000000000000L
    val hour = 3600000000L
    // drain 1: key A at t0 twice (dup within horizon -> one emit), key B;
    // a late "pusher" row advances the watermark past A's expiry (delay 1h)
    val schema = Seq((0L, "x", base)).toDF("k", "tag", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us").schema
    def stage(landing: java.nio.file.Path, name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_wmdedup_stage_")
      rows.toDF("k", "tag", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.createSymbolicLink(landing.resolve(name), part.toPath): Unit
    }
    val landing = java.nio.file.Files.createTempDirectory("graft_wmdedup_")
    val sink = java.nio.file.Files.createTempDirectory("graft_wmdedup_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_wmdedup_ck_")
    def drain(): DataFrame = FileStreams.runAvailableNow(
      FileStreams.distinctKeysWithinWatermark(
        spark.readStream.schema(schema).parquet(landing.toString),
        "ts", Seq("k"), "1 hour"),
      sinkDir = Some(sink), checkpointDir = Some(ck))
    stage(landing, "b1.parquet", Seq(
      (1L, "a1", base), (1L, "a2", base + 60000000L), // dup 1 min apart
      (2L, "b", base + 30 * 60000000L),
      (99L, "push", base + 10 * hour)))               // watermark -> base + 9h
    val first = drain().select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(first == Seq(1L, 2L, 99L), s"drain 1 emitted $first")
    // drain 2: key 1 again AFTER its state expired (wm 9h > t0 + 1h) ->
    // re-emits; key 99 within ITS horizon? 99's expiry = 10h + 1h = 11h >
    // wm 9h -> state alive -> duplicate dropped
    stage(landing, "b2.parquet", Seq(
      (1L, "a3", base + 9 * hour + 30 * 60000000L),
      (99L, "push2", base + 10 * hour + 60000000L)))
    val union = drain().select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(union == Seq(1L, 1L, 2L, 99L),
      s"horizon semantics drifted: $union (want key 1 re-emitted, 99 deduped)")
  }

  test("streaming ewma == batch recursion; restart continues from carried state") {
    val sps = spark; import sps.implicits._
    val batch = batchEvents().where(col("event_type") === "view" && col("user_id") < 20)
    def toPoints(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("us"),
        round(col("value").cast("double") * lit(1e6)).cast("long").as("vE6"))
    val want = graft.operators.Events.ewmaSmooth(batch, "user_id", "ts", "value", 400000L)
      .select(col("user_id").as("k"), col("us"), col("ewma_e6"), col("dev_e6"))
      .collect().map(_.toSeq).toSet
    // single drain over the whole fixture == the batch fold
    val staged = java.nio.file.Files.createTempDirectory("graft_sewma_")
    batch.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    def src() = toPoints(spark.readStream.schema(batch.schema).parquet(staged.toString)
      .where(col("event_type") === "view" && col("user_id") < 20))
      .as[StreamingEwma.KeyedPoint]
    val one = FileStreams.runAvailableNow(
        StreamingEwma.ewmaStream(src(), 400000L).toDF())
      .select(col("k"), col("us"), col("ewmaE6"), col("devE6"))
      .collect().map(_.toSeq).toSet
    assert(one == want, "single drain diverged from the batch recursion")
    // two drains with a restart: the 16-byte state carries the recursion
    val landing = java.nio.file.Files.createTempDirectory("graft_sewma_land_")
    val sink = java.nio.file.Files.createTempDirectory("graft_sewma_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_sewma_ck_")
    val halves = batch.repartitionByRange(2, col("ts"))
    halves.write.mode("overwrite").parquet(s"$landing/stage")
    val parts = new java.io.File(s"$landing/stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val live = java.nio.file.Files.createTempDirectory("graft_sewma_live_")
    def drain(): org.apache.spark.sql.DataFrame = FileStreams.runAvailableNow(
      StreamingEwma.ewmaStream(
        toPoints(spark.readStream.schema(batch.schema).parquet(live.toString)
          .where(col("event_type") === "view" && col("user_id") < 20))
          .as[StreamingEwma.KeyedPoint], 400000L).toDF(),
      sinkDir = Some(sink), checkpointDir = Some(ck))
    java.nio.file.Files.createSymbolicLink(
      live.resolve("a.parquet"), parts(0).toPath): Unit
    drain(): Unit
    java.nio.file.Files.createSymbolicLink(
      live.resolve("b.parquet"), parts(1).toPath): Unit
    val union = drain()
      .select(col("k"), col("us"), col("ewmaE6"), col("devE6"))
      .collect().map(_.toSeq).toSet
    assert(union == want,
      "two-drain union diverged: state did not carry the recursion across the restart")
  }

  test("streaming ewma out-of-order telemetry counts cross-batch regressions") {
    val sps = spark; import sps.implicits._
    val live = java.nio.file.Files.createTempDirectory("graft_sewma_ooo_")
    val sink = java.nio.file.Files.createTempDirectory("graft_sewma_ooo_sink_")
    val ck = java.nio.file.Files.createTempDirectory("graft_sewma_ooo_ck_")
    val acc = StreamingEwma.outOfOrderCounter(spark)
    val schema = Seq((0L, 0L, 0L)).toDF("k", "us", "vE6").schema
    def drain() = FileStreams.runAvailableNow(
      StreamingEwma.ewmaStream(
        spark.readStream.schema(schema).parquet(live.toString)
          .as[StreamingEwma.KeyedPoint],
        500000L, outOfOrder = Some(acc)).toDF(),
      sinkDir = Some(sink), checkpointDir = Some(ck))
    def stage(name: String, rows: Seq[(Long, Long, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sewma_ooo_stage_")
      rows.toDF("k", "us", "vE6")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.createSymbolicLink(live.resolve(name), part.toPath): Unit
    }
    // drain 1: within-batch disorder is SORTED before folding -> no count
    stage("a.parquet", Seq((1L, 200L, 1000000L), (1L, 100L, 2000000L)))
    drain(): Unit
    assert(acc.value == 0L, "within-batch disorder must not count (it is sorted away)")
    // drain 2: us=150 < the state's lastUs=200 -> batch parity degraded
    // for that point, counted; us=300 is in order -> not counted
    stage("b.parquet", Seq((1L, 150L, 3000000L), (1L, 300L, 500000L)))
    val out = drain()
    assert(acc.value == 1L, s"out-of-order count ${acc.value}, want 1")
    assert(out.count() == 4L)
  }

  test("streaming distinct keys == batch distinct") {
    val docs = FileStreams.tableStream(spark, dir, "documents")
      .select(col("source"), md5(col("text")).as("fp"))
    val out = FileStreams.runAvailableNow(
      FileStreams.distinctKeys(docs, Seq("source", "fp")))
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), md5(col("text")).as("fp")).distinct()
    assert(out.collect().map(_.toSeq).toSet == expected.collect().map(_.toSeq).toSet)
  }

  test("auto state store: derived choice == explicit on both sides of the threshold") {
    // pure rule, both sides of the r14-measured crossover: 140 B/key vs a
    // quarter of the heap. 2 GB heap -> budget 0.5 GB -> threshold ~3.8M
    // keys; the 50M-key r14 fixture projects 7 GB and must pick rocksdb.
    val heap2g = 2L * 1024 * 1024 * 1024
    assert(FileStreams.autoStateStoreChoice(10000L, heap2g) == "hdfs")
    assert(FileStreams.autoStateStoreChoice(50000000L, heap2g) == "rocksdb")
    val boundary = heap2g / 4 / 140L
    assert(FileStreams.autoStateStoreChoice(boundary, heap2g) == "hdfs")
    assert(FileStreams.autoStateStoreChoice(boundary + 1, heap2g) == "rocksdb")
    // live drains: "auto" resolves per the SAME rule and the drained
    // result matches the explicit provider on each side. Small estimate
    // -> hdfs side; huge estimate -> rocksdb side (forced low even under
    // a big test heap by the rule itself: Long.MaxValue/140 keys exceeds
    // any heap budget).
    // statePartitions pinned: this test exercises the BACKEND choice only
    // (an estimate of Long.MaxValue/140 keys would otherwise also derive
    // the 32768-partition state fan-out — pathological in local[4])
    def counts(store: Option[String], keys: Long = -1L) = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "1 day", "1 hour"),
      statePartitions = Some(4), stateStore = store, expectedStateKeys = keys)
      .collect().map(_.toSeq).toSet
    val viaHdfs = counts(Some("hdfs"))
    assert(counts(Some("auto"), keys = 100L) == viaHdfs)
    assert(counts(Some("auto")) == viaHdfs) // no estimate: bounded-state default
    val viaRocks = counts(Some("rocksdb"))
    assert(counts(Some("auto"), keys = Long.MaxValue / FileStreams.StatePerKeyBytes) == viaRocks)
  }

  test("derived state partitions: volume rule, floor and cap; drained result matches explicit") {
    // pure rule (round 16 — replaces the hardcoded Some(4) at the gates):
    // floor 4 below the volume knee, one partition per 64 MB of projected
    // state past it, capped at 32768
    assert(FileStreams.derivedStatePartitions(0L) == 4)
    assert(FileStreams.derivedStatePartitions(100000L) == 4) // 14 MB state
    val target = FileStreams.TargetStateBytesPerPartition
    val keysPerPart = target / FileStreams.StatePerKeyBytes // ~479k keys
    assert(FileStreams.derivedStatePartitions(keysPerPart * 4) == 4)
    assert(FileStreams.derivedStatePartitions(keysPerPart * 4 + 1) == 5)
    assert(FileStreams.derivedStatePartitions(keysPerPart * 100) == 100)
    assert(FileStreams.derivedStatePartitions(Long.MaxValue / 1000) ==
      FileStreams.MaxStatePartitions)
    intercept[IllegalArgumentException](FileStreams.derivedStatePartitions(-1L))
    // live drain: an estimate-derived partition count produces the same
    // emitted set as the explicit count it derives to (output-invariance
    // of the state fan-out — the r15 A/B's correctness side)
    def counts(explicit: Option[Int], keys: Long) = FileStreams.runAvailableNow(
      FileStreams.windowedEventCounts(
        FileStreams.tableStream(spark, dir, "events", Seq("ts")),
        "ts", "event_type", "1 day", "1 hour"),
      statePartitions = explicit, expectedStateKeys = keys)
      .collect().map(_.toSeq).toSet
    assert(counts(None, keys = 5000L) == counts(Some(4), keys = -1L))
  }
}
