package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps
import graft.streaming.StreamOps.EventRow

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append")(feed: => Unit): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    feed
    q.awaitTermination(60000)
    spark.table(name)
  }

  test("streaming tumbling window counts with watermark") {
    val input = MemoryStream[EventRow](1, spark, None)
    input.addData(
      EventRow(1, ts(0), 7, "click", 1.0),
      EventRow(2, ts(10), 7, "click", 2.0),
      EventRow(3, ts(61), 8, "view", 3.0),
      // far-future row advances the watermark so the 10:00 window closes
      EventRow(99, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "x", 0.0))
    val out = runToMemory(
      StreamOps.tumblingStats(input.toDF(), window = "1 hour", watermark = "10 minutes"),
      "tumbling") {}
    // complete via AvailableNow: append mode emits only closed windows; check table rows
    val rows = out.collect()
    // the 10:00 hour window closes once the 11:01 event advances the watermark
    assert(rows.exists(r => r.getAs[Long]("n") == 2 && r.getAs[String]("event_type") == "click"),
      s"got ${rows.toSeq}")
  }

  test("stream-static backward as-of ≡ batch AsOfJoin.backward on a gapped snapshot table") {
    // snapshots at 10:00 / 10:20 / 10:40 — events land BETWEEN snapshots
    // (and one before the first), so an equi-join on ts would match nothing:
    // the non-degenerate backward regime
    val snaps = Seq(
      (ts(0), 1.0), (ts(20), 2.0), (ts(40), 3.0)).toDF("ts", "level")
    val events = Seq(
      EventRow(1, Timestamp.valueOf("2024-01-01 09:55:00"), 7, "early", 0.0),
      EventRow(2, ts(0), 7, "at-snap", 0.0), // exactly at a snapshot: matches it
      EventRow(3, ts(5), 7, "mid1", 0.0),
      EventRow(4, ts(25), 8, "mid2", 0.0),
      EventRow(5, ts(39, 59), 8, "edge", 0.0), // just before the next snapshot
      EventRow(6, ts(55), 9, "tail", 0.0)) // after the last snapshot
    val input = MemoryStream[EventRow](91, spark, None)
    input.addData(events: _*)
    val out = runToMemory(
      StreamOps.asOfJoinStatic(input.toDF(), snaps, "ts", "ts", Seq("level")),
      "asof_static") {}
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[Any]("level"))))).toMap
    // batch twin over the same rows
    val batch = graft.core.AsOfJoin.backward(
      events.toDF().select("event_id", "ts"), snaps, "ts", "ts", Seq("level"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("level"))).toMap
    assert(got.view.mapValues(_._2).toMap == batch,
      s"stream-static as-of diverged from batch: got=$got batch=$batch")
    // spot semantics: pre-first-snapshot row unmatched, exact-ts row matched,
    // staleness visible through asof_ts
    assert(got(1L) == ((None, None)))
    assert(got(2L) == ((Some(ts(0)), Some(1.0))))
    assert(got(5L) == ((Some(ts(20)), Some(2.0))))
    assert(got(6L) == ((Some(ts(40)), Some(3.0))))
  }

  test("stream-static enrichment join weights values from the broadcast dimension") {
    val input = MemoryStream[EventRow](11, spark, None)
    val dim = Seq(("click", 2.0), ("view", 0.5)).toDF("event_type", "weight")
    input.addData(
      EventRow(1, ts(0), 7, "click", 1.0),
      EventRow(2, ts(10), 7, "click", 2.0),
      EventRow(3, ts(20), 8, "view", 4.0),
      EventRow(4, ts(30), 8, "purchase", 100.0), // not in dim → dropped
      EventRow(99, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "click", 0.0))
    val out = runToMemory(
      StreamOps.enrichedTumblingStats(input.toDF(), dim,
        window = "1 hour", watermark = "10 minutes"), "enriched") {}
    val rows = out.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("weighted_value")).toMap
    assert(rows.get("click").contains(1.0 * 2.0 + 2.0 * 2.0), s"got $rows")
    assert(rows.get("view").contains(4.0 * 0.5))
    assert(!rows.contains("purchase"), "unknown type must be filtered by the inner join")
  }

  test("streaming session windows aggregate per user") {
    val input = MemoryStream[EventRow](2, spark, None)
    input.addData(
      EventRow(1, ts(0), 7, "click", 1.0),
      EventRow(2, ts(5), 7, "click", 2.0),
      EventRow(3, ts(50), 7, "view", 4.0),
      EventRow(4, ts(59, 59), 9, "view", 0.5))
    // a far-future event to push the watermark past all sessions
    input.addData(EventRow(99, Timestamp.valueOf("2024-01-01 13:00:00"), 1, "x", 0.0))
    val out = runToMemory(
      StreamOps.sessionStats(input.toDF(), gap = "30 minutes", watermark = "1 minute"),
      "sessions") {}
    val rows = out.collect()
    val u7 = rows.filter(_.getAs[Long]("user_id") == 7L)
    assert(u7.length == 2, s"user 7 should have 2 closed sessions: ${rows.toSeq}")
    assert(u7.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("streaming dedup within watermark") {
    val input = MemoryStream[EventRow](3, spark, None)
    input.addData(
      EventRow(1, ts(0), 7, "click", 1.0),
      EventRow(1, ts(0), 7, "click", 1.0), // duplicate id
      EventRow(2, ts(1), 7, "view", 2.0))
    val out = runToMemory(
      StreamOps.dedupeEvents(input.toDF(), watermark = "10 minutes"), "dedup") {}
    assert(out.count() == 2)
  }

  test("streaming session_window ≡ batch sessionization on the events fixture") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))

    // The two formulations diverge ONLY at a gap of exactly 1800 s (batch
    // merges on diff <= gap; session_window starts a new session at
    // diff >= gap). Assert the fixture has no boundary tie → parity is exact.
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ties = ev
      .withColumn("d", col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .filter(col("d") === 1800).count()
    assert(ties == 0, "fixture has an exact-gap tie; parity undefined at the boundary")

    val batch = graft.ext.Events.sessionStats(ev, gapSeconds = 1800).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"),
        r.getAs[Double]("avg_events"), r.getAs[Double]("avg_duration_s"),
        r.getAs[Long]("max_duration_s")))
      .sortBy(_._1)

    val rows = ev.as[EventRow].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    val input = MemoryStream[EventRow](5, spark, None)
    input.addData(rows)
    // far-future sentinel (excluded below) closes every session via watermark
    input.addData(EventRow(-1L, new Timestamp(maxTs + 86400000L), -1L, "sentinel", 0.0))
    val out = runToMemory(
      StreamOps.sessionStats(input.toDF(), gap = "30 minutes", watermark = "1 minute"),
      "sess_parity") {}

    // session_window end = last event + gap → duration = end − start − gap
    val stream = out.filter(col("user_id") >= 0)
      .withColumn("dur_s",
        col("session_end").cast("long") - col("session_start").cast("long") - 1800)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), avg(col("n_events")).as("avg_events"),
        avg(col("dur_s")).as("avg_duration_s"), max(col("dur_s")).as("max_duration_s"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_sessions"),
        r.getAs[Double]("avg_events"), r.getAs[Double]("avg_duration_s"),
        r.getAs[Long]("max_duration_s")))
      .sortBy(_._1)

    assert(stream.length == batch.length,
      s"user counts differ: stream ${stream.length} vs batch ${batch.length}")
    // counts/durations are integers, averages are exact in double → row-for-row
    stream.zip(batch).foreach { case (s, b) => assert(s == b, s"stream $s vs batch $b") }
  }

  test("streaming tumbling windows ≡ batch tumbling stats on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val batch = graft.ext.Events.tumblingStats(ev).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    val rows = ev.as[EventRow].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    val input = MemoryStream[EventRow](6, spark, None)
    input.addData(rows)
    input.addData(EventRow(-1L, new Timestamp(maxTs + 86400000L), -1L, "sentinel", 0.0))
    val out = runToMemory(
      StreamOps.tumblingStats(input.toDF(), window = "1 hour", watermark = "1 minute"),
      "tumb_parity") {}
    val stream = out.filter(col("event_type") =!= "sentinel").collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap

    assert(stream.keySet == batch.keySet,
      s"window keys differ: only-stream ${stream.keySet -- batch.keySet}, " +
        s"only-batch ${batch.keySet -- stream.keySet}")
    stream.foreach { case (k, (n, tot)) =>
      assert(n == batch(k)._1, s"$k count: stream $n batch ${batch(k)._1}")
      // double sums may associate differently between the two engines
      assertApprox(tot, batch(k)._2, tol = 1e-9, clue = s"$k total_value")
    }
  }

  test("streaming DDSketch windows ≡ batch sketch BIT-exactly on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    // batch twin: identical grouping + the same aggregator
    val sk = udaf(new graft.functions.DDSketchAgg.Quantiles(0.01, Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val batch = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sk(col("value")).as("dd"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getSeq[Double](3).toSeq)).toMap

    val rows = ev.as[EventRow].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    val input = MemoryStream[EventRow](14, spark, None)
    input.addData(rows)
    input.addData(EventRow(-1L, new Timestamp(maxTs + 86400000L), -1L, "sentinel", 0.0))
    val out = runToMemory(
      StreamOps.streamingQuantileSketch(input.toDF(), window = "1 hour",
        watermark = "1 minute"), "ddsketch_parity") {}
    val stream = out.filter(col("event_type") =!= "sentinel").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), Seq(r.getDouble(3), r.getDouble(4)))).toMap

    assert(stream.keySet == batch.keySet)
    // merge-order invariance ⇒ streaming state merges give BIT-identical
    // estimates to the batch aggregation — exact ==, no tolerance
    stream.foreach { case (k, (n, ests)) =>
      assert(n == batch(k)._1, s"$k n")
      assert(ests == batch(k)._2.take(2), s"$k estimates: $ests vs ${batch(k)._2}")
    }
  }

  test("streaming OHLC bars ≡ batch daily OHLC on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    // batch reference: the q106 shape (date_trunc day ≡ 1-day tumbling window)
    val batch = ev
      .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
      .agg(min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n_events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap

    val rows = ev.as[EventRow].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    val input = MemoryStream[EventRow](11, spark, None)
    // two batches: open/close witnesses must merge across batch boundaries
    val (early, late) = rows.sortBy(_.ts.getTime).splitAt(rows.length / 2)
    input.addData(early)
    input.addData(late)
    input.addData(EventRow(-1L, new Timestamp(maxTs + 7 * 86400000L), -1L,
      "sentinel", 0.0))
    val out = runToMemory(
      StreamOps.ohlcBars(input.toDF(), window = "1 day", watermark = "1 minute"),
      "ohlc_parity") {}
    val stream = out.filter(col("event_type") =!= "sentinel").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap

    assert(stream.keySet == batch.keySet,
      s"bar keys differ: only-stream ${stream.keySet -- batch.keySet}, " +
        s"only-batch ${batch.keySet -- stream.keySet}")
    // every field selects stored doubles — exact equality, no tolerance
    stream.foreach { case (k, bar) =>
      assert(bar == batch(k), s"$k: stream $bar batch ${batch(k)}")
    }
  }

  test("streaming near-dup suppression: catches a duplicate from an earlier batch") {
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Timestamp, String)](7, spark, None)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    input.addData(
      (1L, ts(0), base),
      (2L, ts(1), "completely unrelated text about catalyst optimizer rules and shuffles"))
    // near-dup of doc 1 arrives later (one word changed)
    input.addData((3L, ts(30), base.replace("today", "tonight")))
    val out = runToMemory(
      StreamOps.streamingNearDuplicates(
        input.toDF().toDF("doc_id", "ts", "text")).toDF(), "neardup") {}
    val hits = out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).distinct
    assert(hits.contains((3L, 1L)), s"expected (3,1) dup hit, got ${hits.toSeq}")
    assert(!hits.exists(h => h._1 == 2L || h._2 == 2L), "unrelated doc must not match")
  }

  test("streaming co-presence join ≡ batch bucketed range join on an interval fixture") {
    import org.apache.spark.sql.functions._
    // closed sessions (user, start, end) across 3 micro-batches; durations
    // stay under the 20-minute maxDuration bound the join condition uses
    def mk(u: Long, sM: Int, eM: Int) = (u, ts(sM), ts(eM))
    val b1 = Seq(mk(1, 0, 10), mk(2, 5, 15))                  // 1-2 overlap
    val b2 = Seq(mk(3, 10, 25), mk(4, 26, 40))                // 3 overlaps 1,2
    val b3 = Seq(mk(5, 15, 15), mk(6, 50, 55))                // 5 touches 2,3
    val all = b1 ++ b2 ++ b3

    val batch = graft.ext.RangeJoin.overlapJoin(
      all.toDF("u", "s", "e").select(col("u").as("u1"),
        col("s").cast("long").as("s1"), col("e").cast("long").as("e1")),
      "s1", "e1",
      all.toDF("u", "s", "e").select(col("u").as("u2"),
        col("s").cast("long").as("s2"), col("e").cast("long").as("e2")),
      "s2", "e2", bucketWidth = 600L, extraPred = col("u1") < col("u2"))
      .select("u1", "u2", "overlap_len").as[(Long, Long, Long)].collect().toSet

    val input = MemoryStream[(Long, Timestamp, Timestamp)](9, spark, None)
    input.addData(b1); input.addData(b2); input.addData(b3)
    val out = runToMemory(
      StreamOps.streamingCopresence(
        input.toDF().toDF("user_id", "session_start", "session_end"),
        maxDuration = "20 minutes", watermark = "30 minutes"), "copresence") {}
    val streamed = out.select("u1", "u2", "overlap_len")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch.contains((1L, 2L, 5L * 60)) && batch.contains((2L, 5L, 0L)),
      s"fixture lost expected overlaps: $batch")
  }

  test("streaming near-dup pair set ≡ batch simhash pairs on the documents fixture") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), new Timestamp(1700000000000L + r.getLong(0)), r.getString(1)))
      .toSeq
    val batchPairs = graft.ext.Dedup.simhashNearDuplicates(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id", "text",
      maxHamming = 3).collect()
      .map(r => (math.min(r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        math.max(r.getAs[Long]("id1"), r.getAs[Long]("id2")))).toSet

    val input = MemoryStream[(Long, Timestamp, String)](8, spark, None)
    input.addData(docs)
    val out = runToMemory(
      StreamOps.streamingNearDuplicates(
        input.toDF().toDF("doc_id", "ts", "text")).toDF(), "neardup_parity") {}
    val streamPairs = out.collect().map(r =>
      (math.min(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")),
        math.max(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))).toSet
    assert(streamPairs == batchPairs,
      s"only-stream ${streamPairs -- batchPairs}, only-batch ${batchPairs -- streamPairs}")
  }

  test("streaming language ID ≡ batch classify on the documents fixture") {
    import org.apache.spark.sql.functions._
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = graft.ext.LangId.classify(docsDf, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = docsDf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)](13, spark, None)
    input.addData(rows)
    val out = runToMemory(
      StreamOps.streamingLangId(input.toDF().toDF("doc_id", "text")), "langid_parity") {}
    val streamed = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch,
      s"diff: ${streamed.toSet.diff(batch.toSet).take(5)} / ${batch.toSet.diff(streamed.toSet).take(5)}")
  }

  test("row-local simhashCol equals the batch explode+groupBy simhash") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val rowLocal = docs.select(col("doc_id").as("id"),
      graft.ext.Dedup.simhashCol(col("text"), 64).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.ext.Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(rowLocal == batch)
  }

  test("streaming funnel ≡ batch funnel stage counts on the events fixture") {
    import org.apache.spark.sql.functions._
    val stages = Seq("view", "click", "purchase")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val batch = graft.ext.Events.funnel(ev, stages).head()
    val batchCounts = stages.map(s => batch.getAs[Long](s"n_$s"))

    val input = MemoryStream[EventRow](9, spark, None)
    input.addData(ev.as[EventRow].collect().toSeq)
    val out = runToMemory(
      StreamOps.streamingFunnel(input.toDS(), stages).toDF(), "funnel_stream") {}
    val reached = out.groupBy("user_id").agg(max("stage").as("m")).collect()
      .map(_.getAs[Int]("m"))
    val streamCounts = stages.indices.map(i => reached.count(_ >= i).toLong)
    assert(streamCounts == batchCounts,
      s"stream $streamCounts vs batch $batchCounts")
    // sanity: the funnel narrows
    assert(batchCounts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("stream-stream attribution pairs ≡ batch interval join on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))

    // batch truth: every qualifying (purchase, click) pair
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("cts"))
    val batch = ev.filter(col("event_type") === "purchase")
      .join(c, col("user_id") === col("u") && col("cts") <= col("ts") &&
        unix_micros(col("cts")) >= unix_micros(col("ts")) - lit(1800L * 1000000L))
      .select(col("event_id"), unix_micros(col("cts")).as("cus"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture has no attributable purchases; test is vacuous")

    val rows = ev.as[EventRow].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max
    val clickIn = MemoryStream[EventRow](12, spark, None)
    val purchIn = MemoryStream[EventRow](13, spark, None)
    clickIn.addData(rows.filter(_.event_type == "click"))
    purchIn.addData(rows.filter(_.event_type == "purchase"))
    // far-future sentinels advance BOTH watermarks so every pair flushes
    clickIn.addData(EventRow(-1L, new Timestamp(maxTs + 86400000L), -1L, "click", 0.0))
    purchIn.addData(EventRow(-2L, new Timestamp(maxTs + 86400000L), -1L, "purchase", 0.0))
    val out = runToMemory(
      StreamOps.streamAttributionPairs(clickIn.toDF(), purchIn.toDF(),
        windowSeconds = 1800, watermark = "30 minutes"), "attr_pairs") {}
    val stream = out.filter(col("user_id") >= 0)
      .select(col("p_id"), unix_micros(col("c_ts")).as("cus"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stream == batch,
      s"pair sets differ: stream-only=${(stream -- batch).take(5)} batch-only=${(batch -- stream).take(5)}")
  }

  test("flatMapGroupsWithState running totals") {
    val input = MemoryStream[EventRow](4, spark, None)
    input.addData(
      EventRow(1, ts(0), 7, "click", 1.5),
      EventRow(2, ts(1), 7, "click", 2.5),
      EventRow(3, ts(2), 8, "view", 1.0))
    val out = runToMemory(
      StreamOps.runningUserTotals(input.toDS()).toDF(), "totals", mode = "append") {}
    val rows = out.collect().map(r =>
      r.getAs[Long]("user_id") -> (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(rows(7L) == ((2L, 4.0)))
    assert(rows(8L) == ((1L, 1.0)))
  }

  test("streaming snapshot diff (CDC) ≡ batch snapshot diff with tombstone feed") {
    import spark.implicits._
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val b = Seq((2L, "beta"), (3L, "GAMMA"), (4L, "delta"))
    val input = MemoryStream[(Long, String)](91, spark, None)
    input.addData(a: _*) // batch 1: snapshot A
    // batch 2: snapshot B + tombstones for the ids A dropped
    input.addData(b ++ Seq((1L, null: String)): _*)
    val out = runToMemory(
      StreamOps.streamingSnapshotDiff(input.toDF().toDF("id", "text")).toDF(),
      "snapdiff") {}
    val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // batch 1 emits added for all of A; batch 2 must emit exactly the batch
    // full-outer diff's classification for every id in A ∪ B
    val batchClasses = graft.ext.Curation.snapshotDiff(
      a.toDF("id", "text"), b.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(batchClasses.toMap == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), "batch fixture drifted")
    val expected = (a.map(x => (x._1, "added")) ++ batchClasses)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expected, s"got $got, want $expected")
    // idempotent replay of B classifies everything unchanged (state kept)
    input.addData(b: _*)
    val out2 = runToMemory(
      StreamOps.streamingSnapshotDiff(input.toDF().toDF("id", "text")).toDF(),
      "snapdiff2") {}
    // a fresh query restarts MemoryStream from its retained batches; the
    // final replayed batch must contribute only unchanged/removed-free rows
    val replay = out2.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val expectedReplay = (a.map(x => (x._1, "added")) ++ batchClasses ++
      b.map(x => (x._1, "unchanged")))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(replay == expectedReplay, s"replay $replay, want $expectedReplay")
  }

  test("streaming HLL registers across batches ≡ batch sketch on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val rows = ev.as[EventRow].collect().toSeq
    val input = MemoryStream[EventRow](11, spark, None)
    // two micro-batches exercise the cross-batch state merge, not just one pass
    input.addData(rows.take(rows.length / 2))
    input.addData(rows.drop(rows.length / 2))
    val regs = runToMemory(
      StreamOps.approxDistinctRegisters(input.toDF(), "event_id", "event_type"),
      "hll_regs", mode = "complete") {}
    val streamEst = graft.ext.Sketches.hllEstimate(regs, Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    val batchEst = graft.ext.Sketches.approxDistinct(ev, "event_id", Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    // registers are bit-identical (max-merge is order-insensitive) and the
    // estimator sums dyadic rationals well inside double precision → exact ==
    assert(streamEst == batchEst, s"stream $streamEst vs batch $batchEst")
  }

  test("streaming monoid state across batches ≡ batch Incremental.state bit-for-bit") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val rows = ev.as[EventRow].collect().toSeq
    val input = MemoryStream[EventRow](15, spark, None)
    // three uneven micro-batches: state must be batch-boundary-invariant
    input.addData(rows.take(rows.length / 4))
    input.addData(rows.slice(rows.length / 4, rows.length / 2))
    input.addData(rows.drop(rows.length / 2))
    val streamed = runToMemory(
      StreamOps.streamingMonoidState(input.toDF()),
      "monoid_state", mode = "complete") {}
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = graft.ext.Incremental.state(ev, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming KMV daily sketches across batches ≡ batch hash lists bit-for-bit") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(e => graft.ext.Events.normalizeTs(e))
    // the sketch precondition: one (day, user) per row (batch q226 dedupes)
    val du = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .withColumn("ts", col("d").cast("timestamp"))
      .select(col("ts"), col("user_id")).as[(Timestamp, Long)].collect().toSeq
    val input = MemoryStream[(Timestamp, Long)](16, spark, None)
    input.addData(du.take(du.length / 3))
    input.addData(du.slice(du.length / 3, 2 * du.length / 3))
    input.addData(du.drop(2 * du.length / 3))
    val streamed = runToMemory(
      StreamOps.streamingKmvDaily(input.toDF().toDF("ts", "user_id"), k = 8),
      "kmv_daily", mode = "complete") {}
      .collect().map(r => r.getDate(0).toString -> r.getSeq[Long](1)).toMap
    val batch = StreamOps.streamingKmvDaily(
      ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        .select(col("d").cast("timestamp").as("ts"), col("user_id")), k = 8)
      .collect().map(r => r.getDate(0).toString -> r.getSeq[Long](1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.values.forall(hs => hs == hs.sorted && hs.length <= 8))
  }

  test("streaming count-min cells across batches ≡ batch sketch on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val rows = ev.as[EventRow].collect().toSeq
    val input = MemoryStream[EventRow](12, spark, None)
    input.addData(rows.take(rows.length / 3))
    input.addData(rows.drop(rows.length / 3))
    val streamCells = runToMemory(
      StreamOps.cmCellsStream(input.toDF(), "event_type", d = 4, w = 16),
      "cm_cells", mode = "complete") {}
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchCells = graft.ext.Sketches.cmCells(
      ev.groupBy("event_type").agg(count(lit(1)).as("cnt")),
      "event_type", "cnt", d = 4, w = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamCells == batchCells,
      s"stream cells $streamCells vs batch $batchCells")
  }

  test("streaming shard-mixing cells across batches ≡ batch chi2 on the documents fixture") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"))
    val rows = d.as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)](31, spark, None)
    // two micro-batches exercise the cross-batch count merge
    input.addData(rows.take(rows.length / 2))
    input.addData(rows.drop(rows.length / 2))
    val memCells = runToMemory(
      StreamOps.shardCellsStream(input.toDF().toDF("doc_id", "source")),
      "shard_cells", mode = "complete") {}
    // re-root the memory view: the epilogue self-joins the cell frame, and
    // the MemoryPlan view exposes identical attribute ids on every branch
    val streamCells = memCells.as[(Long, String, Long)].collect().toSeq
      .toDF("shard", "source", "o")
    val streamChi2 = graft.ext.Splits.shardMixingChi2(streamCells)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batchChi2 = graft.queries.Round8Queries
      .q148ShardMixing(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // cells are integer counts (order-insensitive) and the epilogue pins its
    // float summation order → exact equality of the whole panel
    assert(streamChi2 == batchChi2, s"stream $streamChi2 vs batch $batchChi2")
  }

  test("streaming semantic decontamination ≡ batch per-vector max-cosine") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val bench = emb.filter(col("vec_id") % 20 === 0).orderBy("vec_id")
      .collect().map(_.getAs[Seq[Double]]("embedding").toArray).toSeq
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    val rows = corpus.as[(Long, Seq[Double], Int)].collect().toSeq
    val input = MemoryStream[(Long, Seq[Double], Int)](32, spark, None)
    input.addData(rows.take(rows.length / 2))
    input.addData(rows.drop(rows.length / 2))
    val streamed = runToMemory(
      StreamOps.semanticDecontamStream(
        input.toDF().toDF("vec_id", "embedding", "label"), bench),
      "sem_decontam") {}
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // batch truth: the q142 inner frame (broadcast nested-loop max per vec)
    val e = emb.select(col("vec_id"), col("label"), col("embedding").as("v"),
      sqrt(graft.ext.Similarity.norm2(col("embedding"))).as("n"))
    val b = broadcast(e.filter(col("vec_id") % 20 === 0)
      .select(col("v").as("bv"), col("n").as("bn")))
    val cos = graft.ext.Similarity.dot(col("v"), col("bv")) / (col("n") * col("bn"))
    val batch = e.filter(col("vec_id") % 20 =!= 0).crossJoin(b)
      .groupBy("vec_id").agg(max(cos).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.keySet == batch.keySet)
    // identical double sequences on both paths → exact equality
    streamed.foreach { case (id, (mc, flagged)) =>
      assert(mc == batch(id), s"vec $id: stream $mc vs batch ${batch(id)}")
      assert(flagged == (mc >= 0.35))
    }
  }

  test("streaming running top-k across batches ≡ batch top-k on the events fixture") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val rows = ev.as[EventRow].collect().toSeq
    val input = MemoryStream[EventRow](14, spark, None)
    // three micro-batches exercise repeated truncated state merges
    input.addData(rows.take(rows.length / 3))
    input.addData(rows.slice(rows.length / 3, 2 * rows.length / 3))
    input.addData(rows.drop(2 * rows.length / 3))
    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), posexplode(col("tk")))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getStruct(2).getDouble(0),
        r.getStruct(2).getLong(1)))
      .sorted.toSeq
    val stream = flat(runToMemory(
      StreamOps.topKStream(input.toDF(), "event_type", "value", "event_id", k = 5),
      "topk_stream", mode = "complete") {})
    val batch = flat(StreamOps.topKStream(ev, "event_type", "value", "event_id", k = 5))
    assert(stream.nonEmpty && stream == batch, s"stream $stream vs batch $batch")
  }

  test("streaming image near-dup hits ≡ batch perceptual pairs across batches") {
    import org.apache.spark.sql.functions._
    // content groups of 3: base PNG + resized PNG + tinted PNG per group —
    // every byte-distinct, perceptually near-identical
    val items = (0 until 8).flatMap { g =>
      val w = 24 + g; val h = 20 + (g * 3) % 12
      Seq(
        (g * 10L, new Timestamp(1700000000000L + g * 10),
          graft.ext.Multimodal.synthesizePatternPng(1L, g.toLong, w, h)),
        (g * 10L + 1, new Timestamp(1700000000000L + g * 10 + 1),
          graft.ext.Multimodal.synthesizePatternPng(2L, g.toLong, w * 2, h * 2)),
        (g * 10L + 2, new Timestamp(1700000000000L + g * 10 + 2),
          graft.ext.Multimodal.synthesizePatternPng(200L, g.toLong, w, h)))
    }
    // batch truth over the same corpus
    val batchItems = spark.createDataset(items.map { case (id, _, png) =>
      graft.ext.Multimodal.MediaItem(id, png, "image/png") })
    val ph = graft.ext.Multimodal.perceptualHashes(batchItems).toDF()
    val batchPairs = graft.ext.Dedup.perceptualNearDuplicatePairs(
      ph.filter(col("decoded")), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.size >= 8 * 3, s"planted groups must pair up: ${batchPairs.size}")

    val input = MemoryStream[(Long, Timestamp, Array[Byte])](83, spark, None)
    val q = StreamOps.streamingImageNearDuplicates(
      input.toDF().toDF("id", "ts", "media")).toDF()
      .writeStream.format("memory").queryName("img_dups").outputMode("append").start()
    // split MID-GROUP so cross-batch bucket state is what finds some pairs
    val (b1, b2) = items.splitAt(items.length / 2 + 1)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamPairs = spark.table("img_dups").collect()
      .map(r => (math.min(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")),
        math.max(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))).toSet
    assert(streamPairs == batchPairs,
      s"only-stream ${streamPairs -- batchPairs}, only-batch ${batchPairs -- streamPairs}")
  }

  test("streaming audio near-dup hits ≡ batch perceptual pairs across batches") {
    import org.apache.spark.sql.functions._
    // loudness groups of 3: same planted energy key at amp 4096/8192, plus a
    // one-bit-flipped key at amp 12288 — byte-distinct, energy near-identical
    val items = (0 until 8).flatMap { g =>
      val base = graft.ext.Multimodal.portableHash60(s"sa:$g") | 1L
      (0 until 3).map { t =>
        val key = if (t == 2) base ^ (1L << (1 + g % 58)) else base
        (g * 10L + t, new Timestamp(1700000000000L + g * 10 + t),
          graft.ext.Multimodal.synthesizePatternWav(
            key, (4096 * (t + 1)).toShort, 8000, 1600 + g * 13))
      }
    }
    val batchItems = spark.createDataset(items.map { case (id, _, wav) =>
      graft.ext.Multimodal.MediaItem(id, wav, "audio/wav") })
    val ah = graft.ext.Multimodal.audioPerceptualHashes(batchItems).toDF()
    val batchPairs = graft.ext.Dedup.perceptualNearDuplicatePairs(
      ah.filter(col("decoded")), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.size == 8 * 3, s"planted groups must pair up: ${batchPairs.size}")

    val input = MemoryStream[(Long, Timestamp, Array[Byte])](85, spark, None)
    val q = StreamOps.streamingAudioNearDuplicates(
      input.toDF().toDF("id", "ts", "media")).toDF()
      .writeStream.format("memory").queryName("aud_dups").outputMode("append").start()
    // split MID-GROUP so cross-batch bucket state is what finds some pairs
    val (b1, b2) = items.splitAt(items.length / 2 + 1)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamPairs = spark.table("aud_dups").collect()
      .map(r => (math.min(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")),
        math.max(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))).toSet
    assert(streamPairs == batchPairs,
      s"only-stream ${streamPairs -- batchPairs}, only-batch ${batchPairs -- streamPairs}")
  }

  test("streaming embedding near-dup hits ≡ batch SRP-hamming pairs across batches") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 400)
    // batch truth: same SRP signatures, same banded hamming pairs
    val sigs = emb.select(col("vec_id").as("id"),
      graft.ext.Similarity.srpBucket(col("embedding"), dims = 64, planes = 20)
        .as("simhash"))
    val batchPairs = graft.ext.Dedup.simhashNearDuplicatesFromHashes(
      sigs, maxHamming = 3, bits = 20, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce some close-signature pairs")

    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), new Timestamp(1700000000000L + r.getLong(0)),
        r.getSeq[Float](1).toArray)).sortBy(_._1).toSeq
    val input = MemoryStream[(Long, Timestamp, Array[Float])](84, spark, None)
    val q = StreamOps.streamingEmbeddingNearDuplicates(
      input.toDF().toDF("vec_id", "ts", "embedding"), dims = 64, planes = 20,
      bucketCap = 512).toDF()
      .writeStream.format("memory").queryName("emb_dups").outputMode("append").start()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamPairs = spark.table("emb_dups").collect()
      .map(r => (math.min(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")),
        math.max(r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))).toSet
    assert(streamPairs == batchPairs,
      s"only-stream ${(streamPairs -- batchPairs).take(5)}, " +
        s"only-batch ${(batchPairs -- streamPairs).take(5)}")
  }

  test("streaming curation staged counts ≡ batch q60 panel over a 3-batch feed") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    // static benchmark span set (the src0 docs ARE the benchmark in q60)
    val benchSpans = graft.ext.Dedup.shingleSets(
        docsAll.filter(col("source") === "src0"), "doc_id", "text", shingleSize = 3)
      .select(explode(col("sset")).as("g")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val rows = docsAll.select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), new Timestamp(1700000000000L + r.getLong(0)),
        r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.length == 3, s"${batches.length} batches")

    val inputA = MemoryStream[(Long, Timestamp, String, String)](81, spark, None)
    val flagsQ = StreamOps.streamingCurationFlags(
      inputA.toDF().toDF("doc_id", "ts", "source", "text"), benchSpans)
      .toDF().writeStream.format("memory").queryName("cur_flags")
      .outputMode("append").start()
    val inputB = MemoryStream[(Long, Timestamp, String)](82, spark, None)
    val hitsQ = StreamOps.streamingNearDuplicates(
      inputB.toDF().toDF("doc_id", "ts", "text"), portableHash = true)
      .toDF().writeStream.format("memory").queryName("cur_hits")
      .outputMode("append").start()
    batches.foreach { b =>
      inputA.addData(b)
      inputB.addData(b.map(t => (t._1, t._2, t._4)))
      flagsQ.processAllAvailable()
      hitsQ.processAllAvailable()
    }
    flagsQ.stop(); hitsQ.stop()

    val hitIds = spark.table("cur_hits").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    case class D(id: Long, source: String, tokens: Long, q: Double,
        f1: Boolean, f2: Boolean, f3: Boolean)
    val ds = spark.table("cur_flags").collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      val f1 = r.getAs[Boolean]("novel")
      val f2 = f1 && !hitIds(id)
      val src = r.getAs[String]("source")
      val f3 = f2 && src != "src0" && r.getAs[Long]("overlap") < 5
      D(id, src, r.getAs[Long]("tokens"), r.getAs[Double]("q"), f1, f2, f3)
    }.toSeq
    assert(ds.length == rows.length)
    // global token budget: a periodic BATCH decision over the surviving pool
    val pool = ds.filter(_.f3).map(d => (d.id, d.q, d.tokens))
      .toDF("doc_id", "q", "tokens")
    val s4Ids = graft.ext.Curation.selectByTokenBudget(
      pool, "doc_id", "q", "tokens", 8000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    def stage(pred: D => Boolean): (Long, Long) =
      (ds.count(pred).toLong, ds.filter(pred).map(_.tokens).sum)
    val streamPanel = Seq(
      0L -> stage(_ => true), 1L -> stage(_.f1), 2L -> stage(_.f2),
      3L -> stage(_.f3), 4L -> stage(d => s4Ids(d.id)))
    val batchPanel = graft.queries.ExtQueries.q60CurationPipeline(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) 0L else r.getLong(3)))).toSeq
    assert(streamPanel == batchPanel,
      s"stream $streamPanel\nbatch  $batchPanel")
  }

  test("streaming A/B monitor ≡ batch Welch t-test on the events fixture") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(e => graft.ext.Events.normalizeTs(e))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("double"))
    val batch = graft.queries.Round7Queries.q134WelchAb(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("t_stat"), r.getAs[Double]("welch_df")))).toMap

    val input = MemoryStream[EventRow](21, spark, None)
    input.addData(ev.as[EventRow].collect().toSeq)
    val out = runToMemory(StreamOps.streamingAbMonitor(input.toDF()),
      "ab_monitor", mode = "complete") {}
    val stream = out.collect().map(r => r.getAs[String]("event_type") ->
      ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("t_stat"), r.getAs[Double]("welch_df")))).toMap

    assert(stream.keySet == batch.keySet)
    stream.foreach { case (k, (na, nb, t, df)) =>
      val (bna, bnb, bt, bdf) = batch(k)
      assert(na == bna && nb == bnb, s"$k cohort sizes")
      // batch rounds t to 4 and df to 2 decimals; sufficient-statistics
      // variance vs Welford var_samp also differ in float association
      assertApprox(t, bt, tol = 1e-3, clue = s"$k t_stat")
      assertApprox(df, bdf, tol = 1e-1, clue = s"$k welch_df")
    }
  }

  test("streaming EWMA anomaly flags ≡ batch q177 over a 3-batch daily feed") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.Round9Queries.q177EwmaAnomaly(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("rev_cents"), r.getAs[Double]("ewma_cents"),
          r.getAs[Boolean]("anomaly")))).toMap

    // same daily rollup the batch computes, split chronologically in 3
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .transform(ev => graft.ext.Events.normalizeTs(ev))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("revc"))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("revc"))
      .as[StreamOps.DayRev].collect().sortBy(_.day)
    val thirds = daily.grouped(math.max(1, (daily.length + 2) / 3)).toSeq

    val input = MemoryStream[StreamOps.DayRev](23, spark, None)
    thirds.foreach(b => input.addData(b.toSeq))
    val out = runToMemory(
      StreamOps.ewmaAnomalyStream(input.toDS()).toDF(), "ewma_stream") {}
    val streamed = out.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("rev_cents"), r.getAs[Double]("ewma_cents"),
          r.getAs[Boolean]("anomaly")))).toMap

    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (rev, ewma, flag)) =>
      val (brev, bewma, bflag) = batch(k)
      assert(rev == brev, s"$k revenue")
      // recursive vs closed-form fold orders differ in the last ulps, and
      // the batch side is 6-dp rounded (assertApprox scales tol by |expected|)
      assertApprox(ewma, bewma, tol = 1e-9, clue = s"$k ewma")
      assert(flag == bflag, s"$k anomaly flag")
    }
  }

  test("copresence stream-stream join state stays bounded across many batches") {
    // The scale failure mode of any stream-stream join is UNBOUNDED STATE:
    // if Spark cannot derive a watermark-based eviction bound from the join
    // condition, every row ever seen stays in the state store. Spark logs
    // `StreamingJoinHelper: Error trying to extract state constraint` for
    // the non-arithmetic conjuncts of the copresence condition (the bucket
    // equality and the ownership clause), so this test PROVES the bound
    // empirically from stateOperators metrics: 8 batches, each 1 hour later
    // than the previous and each adding the same number of sessions, with a
    // 30-minute watermark. Bounded eviction ⇒ state plateaus at ~2 batches'
    // worth of rows; broken eviction ⇒ state grows linearly to 8 batches.
    val input = MemoryStream[(Long, Timestamp, Timestamp)](22, spark, None)
    val joined = StreamOps.streamingCopresence(
      input.toDF().toDF("user_id", "session_start", "session_end"),
      bucketWidth = 600L, maxDuration = "20 minutes", watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("copresence_state")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      def batchAt(hour: Int): Seq[(Long, Timestamp, Timestamp)] =
        (0 until 4).map { u =>
          val s = base + hour * 3600000L + u * 60000L
          (u.toLong, new Timestamp(s), new Timestamp(s + 5 * 60000L))
        }
      val totals = (0 until 8).map { h =>
        input.addData(batchAt(h))
        q.processAllAvailable()
        val p = q.lastProgress
        val st = p.stateOperators
        assert(st.nonEmpty, "no state operator in progress metrics")
        st.map(_.numRowsTotal).sum
      }
      // per-batch state contribution: 4 sessions x ≤2 buckets x 2 sides
      val perBatch = totals.head
      assert(perBatch > 0, s"first batch left no state rows: $totals")
      // bounded: the plateau stays within ~3 batches' worth (watermark 30min
      // < 1h batch spacing, so at most the current batch + eviction lag
      // should survive); unbounded growth would reach 8x by the last batch
      assert(totals.last <= 3 * perBatch,
        s"state grew unboundedly across batches: $totals")
      // and growth must have stopped: the last three snapshots are flat
      assert(totals(7) <= totals(5),
        s"state still growing at batch 8: $totals")
    } finally q.stop()
  }

  test("streaming wealth/peak/drawdown ≡ batch withDrawdown BIT-exactly across micro-batches") {
    import graft.api.SeriesFrame
    // two assets x 30 days of deterministic pseudo-returns incl. a deep
    // drawdown stretch, fed in THREE chronological micro-batches
    val rng = new scala.util.Random(42)
    val rows = for {
      a <- Seq("X", "Y"); i <- 0 until 30
    } yield StreamOps.RetRow(a, java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"),
      if (i >= 10 && i <= 14) -0.08 + 0.01 * rng.nextDouble()
      else -0.03 + 0.07 * rng.nextDouble())
    val batches = rows.groupBy(r => r.d.toLocalDate.getDayOfMonth / 11).toSeq.sortBy(_._1)
    val input = MemoryStream[StreamOps.RetRow](15, spark, None)
    batches.foreach { case (_, b) => input.addData(b: _*) }
    val out = runToMemory(
      StreamOps.streamingWealthDrawdown(input.toDF()).toDF(), "wealthdd") {}
      .collect()
      .map(r => (r.getAs[String]("asset"), r.getAs[java.sql.Date]("d").toString) ->
        ((r.getAs[Double]("wealth"), r.getAs[Double]("peak"), r.getAs[Double]("dd"))))
      .toMap
    val batch = graft.api.GroupedStats.withDrawdown(
      SeriesFrame(rows.toDF(), Seq("asset"), "d", "r")).df
      .withColumn("__peak", org.apache.spark.sql.functions.max("__wealth")
        .over(SeriesFrame(rows.toDF(), Seq("asset"), "d", "r").runWindow))
      .collect()
    assert(batch.length == 60 && out.size == 60, s"${batch.length} vs ${out.size}")
    batch.foreach { r =>
      val k = (r.getAs[String]("asset"), r.getAs[java.sql.Date]("d").toString)
      val (w, p, dd) = out(k)
      // BIT equality: same left-to-right multiply order as the running window
      assert(java.lang.Double.doubleToLongBits(w) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("__wealth")), s"wealth at $k")
      assert(java.lang.Double.doubleToLongBits(dd) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("__dd")), s"dd at $k")
      assert(p == r.getAs[Double]("__peak"), s"peak at $k")
    }
    // the drawdown stretch must actually draw down (non-trivial fixture)
    assert(out.values.exists(_._3 < -0.2), "fixture never entered a deep drawdown")
  }

  test("streaming wealth/drawdown rejects an out-of-order feed loudly") {
    // two SEPARATE micro-batches (out-of-order WITHIN a batch is legal — the
    // operator sorts each batch; only regression across batches must throw)
    val input = MemoryStream[StreamOps.RetRow](16, spark, None)
    val q = StreamOps.streamingWealthDrawdown(input.toDF()).toDF()
      .writeStream.format("memory").queryName("wealthdd_ooo")
      .outputMode("append").start()
    try {
      input.addData(StreamOps.RetRow("X", java.sql.Date.valueOf("2024-01-05"), 0.01))
      q.processAllAvailable()
      input.addData(StreamOps.RetRow("X", java.sql.Date.valueOf("2024-01-03"), 0.01))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(60000)
      }
      assert(e.getMessage.contains("out-of-order") ||
        Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("out-of-order"))),
        s"unexpected failure: ${e.getMessage}")
    } finally q.stop()
  }

  test("streaming decayed engagement ≡ batch anchored-decay sum, bit-equal") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(16005)
    val events = (1L to 60L).map { i =>
      EventRow(i, ts((i / 3).toInt, (i % 3).toInt * 7), i % 5, "e",
        math.rint(rnd.nextDouble() * 1000) / 100.0)
    }
    val anchor = events.map(_.ts).maxBy(_.getTime)
    val df = events.toDF()
    // batch reference: the SAME term expression, summed in (user, us, term)
    // encounter order on one partition — the order the stream feeds
    val dtDays = (lit(anchor.getTime * 1000L) - unix_micros(col("ts")))
      .cast("double") / 86400000000.0 / 7.0
    val batch = df.select(col("user_id"), unix_micros(col("ts")).as("us"),
      (col("value") * pow(lit(0.5), dtDays)).as("term"))
      .coalesce(1).sortWithinPartitions("user_id", "us", "term")
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("term").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val input = MemoryStream[EventRow](18, spark, None)
    val q = StreamOps.streamingDecayedEngagement(input.toDF(), anchor).toDF()
      .writeStream.format("memory").queryName("decay_eng")
      .outputMode("append").start()
    try {
      // time-ordered batches: concatenated per-user order = fully sorted
      events.sortBy(_.ts.getTime).grouped(20).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    // last emitted snapshot per user
    val got = spark.table("decay_eng").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2._1)._2 }
    assert(got.keySet == batch.keySet)
    got.foreach { case (u, (n, s)) =>
      assert((n, s) == batch(u), s"user $u: ($n, $s) vs ${batch(u)}")
    }
  }

  test("streaming segment dedup ≡ batch dedupSegmentsRebuild over a 3-batch feed") {
    // duplicate segments planted within a doc, across docs in one batch, and
    // across batches; docs fed in doc_id order = the batch tie order
    val docs = Seq(
      (0L, "a b c d e f g h"),   // segs [a b c d], [e f g h]
      (1L, "a b c d x y"),       // seg0 dups doc0 seg0 (same batch)
      (2L, "p q r s"),
      (3L, "e f g h p q r s"),   // both segs dup earlier docs (cross-batch)
      (4L, "x y"),               // unique short seg
      (5L, "x y"))               // exact dup of doc4 (cross-batch)
    val seg = 4
    val batch = graft.ext.Dedup.dedupSegmentsRebuild(
      docs.toDF("doc_id", "text"), "doc_id", "text", seg)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap

    val input = MemoryStream[(Long, String)](17, spark, None)
    val q = StreamOps.streamingSegmentDedup(
      input.toDF().toDF("doc_id", "text"), segTokens = seg).toDF()
      .writeStream.format("memory").queryName("seg_dedup")
      .outputMode("append").start()
    try {
      docs.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val kept = spark.table("seg_dedup").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2)).toMap

    // per-doc kept count matches, and rebuilding from the streaming keep
    // flags reproduces the batch rebuilt text
    val segRows = graft.ext.Dedup.segmentRows(
      docs.toDF("doc_id", "text"), "doc_id", "text", seg)
      .select("id", "seg_idx", "seg").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    docs.foreach { case (id, _) =>
      val mine = segRows.filter(_._1 == id).sortBy(_._2)
      val rebuilt = mine.filter(s => kept((s._1, s._2))).map(_._3).mkString(" ")
      assert((mine.count(s => kept((s._1, s._2))).toLong, rebuilt) == batch(id),
        s"doc $id")
    }
  }

  test("streaming winnowing ≡ batch first-claimant over a 3-batch feed") {
    // shared 5-gram phrases planted within a batch and across batches
    val phrase = "w1 w2 w3 w4 w5 w6"
    val docs = Seq(
      (0L, s"$phrase a1 a2 a3"),
      (1L, s"b1 b2 $phrase b3"),        // shares doc0's phrase (same batch)
      (2L, "c1 c2 c3 c4 c5 c6 c7"),
      (3L, s"d1 $phrase d2 d3"),        // cross-batch share
      (4L, "e1 e2 e3"),                 // shorter than k: no fingerprints
      (5L, "c1 c2 c3 c4 c5"))           // exact 5-gram of doc2's head
    val (k, w) = (5, 4)
    // batch reference: per hv the globally first (doc_id, pos) is novel
    val fps = graft.ext.Dedup.winnowFingerprints(
      docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val firstOf = fps.groupBy(_._3)
      .map { case (hv, rs) => hv -> rs.map(r => (r._1, r._2)).min }
    val expect = fps.map { case (id, pos, hv) =>
      (id, pos, hv) -> (firstOf(hv) == ((id, pos)))
    }.toMap

    val input = MemoryStream[(Long, String)](18, spark, None)
    val q = StreamOps.streamingWinnowing(
      input.toDF().toDF("doc_id", "text"), k = k, w = w).toDF()
      .writeStream.format("memory").queryName("winnow")
      .outputMode("append").start()
    try {
      docs.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("winnow").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getBoolean(3))
      .toMap
    assert(got.keySet == expect.keySet,
      s"fingerprint rows differ: ${got.keySet.diff(expect.keySet)} / ${expect.keySet.diff(got.keySet)}")
    expect.foreach { case (key, novel) =>
      assert(got(key) == novel, s"fingerprint $key: novel ${got(key)} vs $novel")
    }
    // the plant worked: some fingerprints are shared (non-novel rows exist)
    assert(got.values.exists(!_), "fixture produced no shared fingerprints")
  }

  test("streaming containment candidates: batch-boundary-independent, lossless vs verified pairs") {
    val quote = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = Seq(
      (0L, s"$quote r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"), // container (arrives first)
      (1L, quote),                                     // contained in doc0
      (2L, "s1 s2 s3 s4 s5 s6"),
      (3L, s"t1 t2 $quote t3"),                        // another container
      (4L, "s1 s2 s3 s4"),                             // contained in doc2 (cross-batch, contained LAST)
      (5L, "u1 u2 u3 u4"))
    val t = 0.5
    val sh = 3
    def req(sz: Int): Int = math.ceil(java.math.BigDecimal.valueOf(t * sz)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()).toInt
    // plain-Scala reference under the SAME hash total order
    val sets = graft.ext.Dedup.shingleSets(docs.toDF("doc_id", "text"),
      "doc_id", "text", sh).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val prefix = sets.map { case (id, s) => id -> s.take(s.size - req(s.size) + 1).toSet }
    val expect = (for {
      (aid, as) <- sets.toSeq; (bid, bs) <- sets.toSeq
      if aid != bid && bs.size >= req(as.size) &&
        prefix(aid).exists(bs.toSet.contains)
    } yield (aid, bid, as.size, bs.size)).toSet

    def run(name: String, groups: Int): Set[(Long, Long, Int, Int)] = {
      val input = MemoryStream[(Long, String)](19 + groups, spark, None)
      val q = StreamOps.streamingContainmentCandidates(
        input.toDF().toDF("doc_id", "text"), shingleSize = sh, threshold = t)
        .toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        docs.grouped(groups).foreach { b => input.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    }
    val got2 = run("contain2", 2)
    val got3 = run("contain3", 3)
    assert(got2 == expect, s"2-batch: ${got2.diff(expect)} / ${expect.diff(got2)}")
    assert(got3 == expect, "candidate set depends on micro-batch boundaries")
    // losslessness: every batch-VERIFIED containment pair is a candidate
    val verified = graft.ext.Dedup.containmentPairs(
      graft.ext.Dedup.shingleSets(docs.toDF("doc_id", "text"), "doc_id",
        "text", sh), t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture produced no true containment pairs")
    val candPairs = got2.map(c => (c._1, c._2))
    assert(verified.subsetOf(candPairs),
      s"candidates missed verified pairs: ${verified.diff(candPairs)}")
  }
}
