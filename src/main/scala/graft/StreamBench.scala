package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.gen.DataGen
import graft.io.{JsonDirSource, LakeSink}
import graft.ops.Ingest
import graft.stream.Pipeline

/** Streaming throughput bench: [[Pipeline.run]] (two queries — the
  * source is scanned once PER SINK) vs [[Pipeline.runSingleScan]] (one
  * query, each micro-batch persisted and fanned out to both sinks —
  * the reference's statement-set shape) on a generated JSON backfill
  * at two input sizes.
  *
  * Both modes do the same sink work (unpartitioned parquet appends:
  * full raw rows + windowed aggregate rows), so the measured difference
  * is the source/scan topology. rows/s = input messages / wall seconds
  * for the mode's queries to drain all available input (AvailableNow).
  *
  * Emits one JSON line:
  *   {"metric":"stream_rows_per_sec","modes":{"two_query@100k":N,...},...}
  * Results are recorded in BASELINE.md §streaming.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-stream-bench")
    val work = Files.createTempDirectory("graft-streambench").toString
    val end = Instant.parse("2025-01-08T00:00:00Z")
    // rows = days·86400/step × 16 dims: 96 s → ~100k, 10 s → ~968k.
    val sizes = Seq("100k" -> 96L, "1m" -> 10L)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val loadStart = readLoad()

    for ((label, step) <- sizes) {
      val topic = s"$work/topic_$label"
      val messages = Ingest.encode(
        DataGen.backfill(spark, end, stepSeconds = step)
          .withColumn("event_time", timestamp_micros(col("tus"))))
      messages.select("value").write.text(topic)
      val n = spark.read.text(topic).count()

      // Mode A: two independent queries (source scanned twice).
      val rawA = LakeSink(s"$work/a_$label/raw", partitionCols = Nil)
      val aggA = LakeSink(s"$work/a_$label/agg", partitionCols = Nil)
      val tA = time {
        val (rq, aq) = Pipeline.run(spark, JsonDirSource(topic).readStream(spark),
          writeRaw = b => rawA.append(b),
          writeAgg = b => aggA.append(b),
          checkpointDir = s"$work/a_$label/ckpt")
        rq.awaitTermination(); aq.awaitTermination()
      }
      results(s"two_query@$label") = n / tA
      System.err.println(f"[stream-bench] two_query@$label  $n rows  $tA%.1fs  ${n / tA}%.0f rows/s")

      // Mode B: single scan, dual sink via persisted micro-batch.
      val rawB = LakeSink(s"$work/b_$label/raw", partitionCols = Nil)
      val aggB = LakeSink(s"$work/b_$label/agg", partitionCols = Nil)
      val tB = time {
        val q = Pipeline.runSingleScan(spark, JsonDirSource(topic).readStream(spark),
          writeRaw = b => rawB.append(b),
          writeAggPartials = p => aggB.append(p),
          checkpointDir = s"$work/b_$label/ckpt")
        q.awaitTermination()
      }
      results(s"single_scan@$label") = n / tB
      System.err.println(f"[stream-bench] single_scan@$label  $n rows  $tB%.1fs  ${n / tB}%.0f rows/s")

      require(rawA.read(spark).count() == n && rawB.read(spark).count() == n,
        s"raw sink row mismatch at $label")

      // Mode C (100k only): FULL OUTER stream-stream interval join —
      // all readings vs the rare pressure-excursion alerts (>2σ,
      // ~2.3%) of the same topic, 2-minute lookback per machine.
      // Quantifies the state-bounded two-sided outer join
      // (Pipeline.correlateFull): both stores purge at the watermark,
      // leftovers null-pad on eviction. The alert side MUST be
      // selective: Spark's symmetric stream join probes every state
      // row of the equality key per input row, and this topic has only
      // 4 machines — a dense right side makes the probe per-key
      // quadratic (measured: 124 s dense vs ~8 s at 2.3%). Rare-alert
      // correlation is the operator's design point; dense-dense
      // correlation belongs in a windowed aggregate instead.
      // rows/s = input messages / wall seconds to drain.
      if (label == "100k") {
        val outC = LakeSink(s"$work/c_$label/joined", partitionCols = Nil)
        val tC = time {
          val l = Pipeline.prepare(JsonDirSource(topic).readStream(spark))
            .select(col("machine_id"), col("sensor_type"), col("value"),
              col("event_time"))
          val r = Pipeline.prepare(JsonDirSource(topic).readStream(spark))
            .filter(col("sensor_type") === "pressure" && col("value") > 170)
            .select(col("machine_id"), col("value").as("alert_value"),
              col("event_time").as("alert_time"))
          val q = Pipeline.correlateFull(l, r, "machine_id",
            "event_time", "alert_time", "2 MINUTES")
            .writeStream.outputMode("append")
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$work/c_$label/ckpt")
            .foreachBatch { (b: DataFrame, _: Long) => outC.append(b) }
            .start()
          q.awaitTermination()
        }
        results(s"fullouter_join@$label") = n / tC
        System.err.println(
          f"[stream-bench] fullouter_join@$label  $n rows  $tC%.1fs  ${n / tC}%.0f rows/s")
        // Drain-to-empty guarantee: every left READING outside the
        // FINAL watermark horizon emits (matched or null-padded on
        // eviction). The trailing horizon itself never finalizes —
        // AvailableNow runs exactly ONE no-data eviction batch, so
        // rows the final watermark hasn't passed stay in state
        // (measured: 60 of 100,800 on an idle machine, where the
        // whole topic lands in one micro-batch). Coverage counts
        // DISTINCT left keys, not emitted rows — multi-alert matches
        // and right-only null rows would otherwise inflate the total
        // past n and mask stranded left state. 99% of distinct keys
        // is the invariant a static-topic drain actually provides;
        // exact null-pad semantics are PipelineSpec's job.
        val emittedC = outC.read(spark)
        val matchedC = emittedC.filter(col("alert_time").isNotNull &&
          col("event_time").isNotNull).count()
        val leftOnlyC = emittedC.filter(col("alert_time").isNull).count()
        val coveredLeft = emittedC.filter(col("event_time").isNotNull)
          .select(col("machine_id"), col("sensor_type"), col("event_time"))
          .distinct().count()
        require(matchedC > 0 && leftOnlyC > 0 &&
          coveredLeft >= (n * 99) / 100,
          s"full-outer drain must cover all but the final watermark " +
            s"horizon at $label (matched=$matchedC leftOnly=$leftOnlyC " +
            s"coveredLeft=$coveredLeft of $n)")
      }
    }

    // Mode D: windowed Misra–Gries heavy hitters at both sizes —
    // sketch state is O(k) per window however many readings arrive,
    // vs the exact windowed agg's per-(window, key) state. Same
    // drain-to-empty protocol; sink work is the tiny top-k rows.
    for ((label, _) <- sizes) {
      val topic = s"$work/topic_$label"
      val n = spark.read.text(topic).count()
      val outD = LakeSink(s"$work/d_$label/hh", partitionCols = Nil)
      val tD = time {
        val q = Pipeline.windowedHeavyHitters(
            Pipeline.prepare(JsonDirSource(topic).readStream(spark)),
            "1 minute", k = 9)
          .writeStream.outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$work/d_$label/ckpt")
          .foreachBatch { (b: DataFrame, _: Long) => outD.append(b) }
          .start()
        q.awaitTermination()
      }
      results(s"windowed_mg@$label") = n / tD
      val emitted = outD.read(spark)
      require(emitted.count() > 0 &&
        emitted.agg(max("rank")).head().getInt(0) <= 8,
        s"MG output must be bounded by the counter budget at $label")
      System.err.println(
        f"[stream-bench] windowed_mg@$label  $n rows  $tD%.1fs  ${n / tD}%.0f rows/s")
    }

    // Mode E: exactly-once dedup on an at-least-once transport —
    // every message delivered TWICE (producer-retry shape), then
    // dropDuplicatesWithinWatermark restores exactly-once content
    // with state held only until the watermark passes each key.
    // rows/s counts the DOUBLED input (the transport volume the
    // operator absorbs). The output must hold no duplicates (the
    // exactly-once claim); count coverage gets the same 99%
    // watermark-horizon allowance as mode C.
    for ((label, _) <- sizes) {
      val topic = s"$work/topic_$label"
      val dupTopic = s"$work/topic_dup_$label"
      spark.read.text(topic).write.mode("overwrite").text(dupTopic)
      spark.read.text(topic).write.mode("append").text(dupTopic)
      val n2 = spark.read.text(dupTopic).count()
      val outE = LakeSink(s"$work/e_$label/deduped", partitionCols = Nil)
      val tE = time {
        val q = Pipeline.rawRows(Pipeline.dedupedStream(
            Pipeline.prepare(JsonDirSource(dupTopic).readStream(spark))))
          .writeStream.outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$work/e_$label/ckpt")
          .foreachBatch { (b: DataFrame, _: Long) => outE.append(b) }
          .start()
        q.awaitTermination()
      }
      results(s"dedup_stream@$label") = n2 / tE
      val emitted = outE.read(spark)
      val outRows = emitted.count()
      val distinctRows = emitted
        .select(col("machine_id"), col("sensor_type"), col("timestamp"))
        .distinct().count()
      require(outRows == distinctRows,
        s"dedup output must be exactly-once at $label " +
          s"($outRows rows, $distinctRows distinct)")
      require(outRows <= n2 / 2 && outRows >= (n2 / 2) * 99 / 100,
        s"dedup must emit each reading once (watermark-horizon slack) " +
          s"at $label: $outRows of ${n2 / 2}")
      System.err.println(
        f"[stream-bench] dedup_stream@$label  $n2 rows  $tE%.1fs  ${n2 / tE}%.0f rows/s")
    }

    // Mode F: streaming incremental JOIN-view maintenance at 100k —
    // the machine dim rides the SAME topic as CDC-shaped "dim:" rows
    // (one small leading file), facts are the readings; each
    // micro-batch folds its delta quadrants into the standing
    // per-machine-type view (JoinView.maintain). The A_old⋈B_old
    // quadrant is never recomputed — the final view must still equal
    // a full join+aggregate over everything (the mv_refresh_join
    // contract, here asserted after a streamed drain).
    locally {
      val label = "100k"
      val topic = s"$work/topic_$label"
      val cdcTopic = s"$work/topic_cdc_$label"
      spark.read.text(topic).write.mode("overwrite").text(cdcTopic)
      val dimLines = DataGen.machineDim(spark)
        .select(to_json(struct(
          lit("2024-12-01T00:00:00").as("timestamp"),
          col("machine_id"),
          concat(lit("dim:"), col("machine_type")).as("sensor_type"),
          lit(0.0).as("value"))).as("value"))
      dimLines.write.mode("append").text(cdcTopic)
      val n = spark.read.text(cdcTopic).count()
      val splitA = (b: DataFrame) =>
        b.filter(!col("sensor_type").startsWith("dim:"))
          .select(col("machine_id"), col("value"))
      val splitB = (b: DataFrame) =>
        b.filter(col("sensor_type").startsWith("dim:"))
          .select(col("machine_id").as("dim_machine_id"),
            expr("substring(sensor_type, 5)").as("machine_type"))
      var handle: Option[graft.stream.JoinView.Handle] = None
      val tF = time {
        val decoded = Pipeline.prepare(
          JsonDirSource(cdcTopic).readStream(spark))
        val (q, h) = graft.stream.JoinView.maintain(decoded,
          splitA, splitB,
          join = (f, d) => f.join(d, col("machine_id") === col("dim_machine_id")),
          keys = Seq("machine_type"), value = "value", scale = 2,
          checkpointDir = s"$work/f_$label/ckpt")
        handle = Some(h)
        q.awaitTermination()
      }
      results(s"ivm_join_view@$label") = n / tF
      val view = handle.get.view
      val full = graft.ops.Incremental.partials(
        splitA(spark.read.json(cdcTopic)).join(
          splitB(spark.read.json(cdcTopic)),
          col("machine_id") === col("dim_machine_id")),
        Seq("machine_type"), "value", scale = 2)
      val vRows = view.select(col("machine_type"), col("n"),
        col("sum_v").cast("string")).collect().map(_.toSeq).toSet
      val fRows = full.select(col("machine_type"), col("n"),
        col("sum_v").cast("string")).collect().map(_.toSeq).toSet
      require(vRows == fRows && vRows.nonEmpty,
        s"stream-maintained view must equal full recompute ($vRows vs $fRows)")
      System.err.println(
        f"[stream-bench] ivm_join_view@$label  $n rows  $tF%.1fs  ${n / tF}%.0f rows/s")
    }

    // Mode G: streaming document curation — the LLM-ingest flow
    // (stream.Curate: quality filter → PII scrub → exactly-once
    // content dedup → broadcast decontamination) draining a 50k-doc
    // topic (sf0.1 documents × 10 replicas — the replicas ARE the
    // dedup workload, and ~10% of content is eval-fingerprinted).
    // The number only records after the stream output set is REQUIREd
    // equal to the batch replica (mode-F discipline).
    locally {
      val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text"))
      val input = (0 until 10).map(k => docs0.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
        .withColumn("event_time",
          lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
      val topic = s"$work/topic_docs"
      input.write.mode("overwrite").parquet(topic)
      val evalFps = docs0
        .filter(pmod(graft.ext.Dedup.md5Hash60(col("doc_id").cast("string")),
          lit(20L)) < 2)
        .select(graft.ext.TextOps.contentFingerprint(col("text")).as("fp"))
      val n = spark.read.parquet(topic).count()
      val sink = s"$work/g_out"
      val tG = time {
        val q = graft.stream.Curate.curate(
            spark.readStream.schema(input.schema).parquet(topic), evalFps)
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", s"$work/g_ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      results(s"curate@${n / 1000}k") = n / tG
      val sFps = spark.read.parquet(sink)
        .select("fp").collect().map(_.getString(0)).toSet
      val bFps = graft.stream.Curate.curateBatch(spark.read.parquet(topic), evalFps)
        .select("fp").collect().map(_.getString(0)).toSet
      require(sFps == bFps && sFps.nonEmpty,
        s"curated stream set (${sFps.size}) must equal batch replica (${bFps.size})")
      System.err.println(
        f"[stream-bench] curate@${n / 1000}k  $n rows  $tG%.1fs  ${n / tG}%.0f rows/s  " +
          s"kept=${sFps.size}")
    }

    // Mode H: streaming drift monitor — stream.DriftMonitor draining
    // the full sf0.1 events table (100k rows, 30 days × 5 types) as
    // 1-day windows against a first-week reference histogram, PSI per
    // finalized (type, day) computed in foreachBatch. A sentinel event
    // past the corpus flushes every real window through the watermark;
    // the number only records after the streamed PSI set is REQUIREd
    // equal to the batch replica on the same finalized windows.
    locally {
      val ev = graft.Tables.eventsWithTime(spark, "/root/testdata/sf0.1")
        .select(col("event_type"), col("event_time"), col("value"))
      val sentinelTs = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
      val input = ev.unionByName(ev.limit(1)
        .select(col("event_type"), lit(sentinelTs).as("event_time"),
          col("value")))
      val topic = s"$work/topic_drift"
      input.write.mode("overwrite").parquet(topic)
      val n = spark.read.parquet(topic).count()
      val reference = ev
        .filter(col("event_time") < "2024-01-08")
        .groupBy(col("event_type"),
          floor(col("value") / 5.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("rc"))
        .localCheckpoint(true)
      val sink = s"$work/h_out"
      val tH = time {
        val hist = graft.stream.DriftMonitor.windowedHistogram(
          spark.readStream.schema(input.schema).parquet(topic),
          "1 day", "30 seconds", binWidth = 5.0)
        val q = hist.writeStream.outputMode("append")
          .option("checkpointLocation", s"$work/h_ckpt")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              if (!b.isEmpty)
                graft.stream.DriftMonitor.psiVsReference(b, reference)
                  .write.mode("append").parquet(sink)
              ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      results(s"drift@${n / 1000}k") = n / tH
      val sRows = spark.read.parquet(sink)
        .filter(col("window_start") < sentinelTs)
        .select(col("event_type"), col("window_start").cast("string"),
          col("psi_x1e6")).collect().map(_.toSeq).toSet
      val bRows = graft.stream.DriftMonitor.monitorBatch(
          spark.read.parquet(topic), reference, "1 day", binWidth = 5.0)
        .filter(col("window_start") < sentinelTs)
        .select(col("event_type"), col("window_start").cast("string"),
          col("psi_x1e6")).collect().map(_.toSeq).toSet
      require(sRows == bRows && sRows.nonEmpty,
        s"streamed PSI set (${sRows.size}) must equal batch replica (${bRows.size})")
      System.err.println(
        f"[stream-bench] drift@${n / 1000}k  $n rows  $tH%.1fs  ${n / tH}%.0f rows/s  " +
          s"windows=${sRows.size}")
    }

    // Mode I: streaming NEAR-DUP curation — mode G's flow plus the
    // banded-LSH keyed-state MinHash stage (stream.NearDup): sf0.1
    // documents + a near-dup copy of every 3rd doc (last 3 tokens
    // dropped — the withNearDups perturbation, true near-dups, not
    // exact retries). State shape: one (doc_id, 32-long signature)
    // row per band occurrence, watermark/retention-bounded — 8 rows
    // per in-window doc, never stream-length-scaled. The number only
    // records after the kept doc_id set is REQUIREd equal to the
    // batch minhashPairs-derived survivor set (mode-F discipline).
    // RocksDB provider: transformWithState is RocksDB-only.
    locally {
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Two chained stateful operators × shuffle partitions = that
      // many RocksDB instances to open/commit per micro-batch; at
      // this topic size the store fixed cost dominates, so run the
      // mode at 8 state partitions (the knob a production job sizes
      // to its throughput; state per instance stays tiny either way).
      val partKey = "spark.sql.shuffle.partitions"
      val prevPart = spark.conf.get(partKey)
      spark.conf.set(partKey, "8")
      try {
        val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
          .select(col("doc_id"), col("text"))
        val toks = graft.ext.TextOps.tokens(col("text"))
        // three perturbation families so most of the topic IS the
        // near-dup workload: every doc minus its last 3 tokens, every
        // 2nd doc minus its first 3, every 3rd doc minus its last 6
        // (a chain: near-dup of both the original and the first copy)
        // Copies carry LATER event_times than originals (+1/+2/+3 s,
        // chain order), so BandDedupProcessor's within-micro-batch
        // (event_time, doc_id) sort puts every original before its
        // copies by construction, not by the doc_id-offset accident.
        def stamped(df: DataFrame, sec: Int): DataFrame =
          df.withColumn("event_time",
            lit(java.sql.Timestamp.valueOf(f"2026-01-01 10:00:0$sec")))
        val nears1 = stamped(docs0
          .select((col("doc_id") + 50000000L).as("doc_id"),
            concat_ws(" ",
              slice(toks, lit(1), greatest(size(toks) - 3, lit(1)))).as("text")), 1)
        val nears2 = stamped(docs0.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 100000000L).as("doc_id"),
            concat_ws(" ",
              slice(toks, lit(4), greatest(size(toks) - 3, lit(1)))).as("text")), 2)
        val nears3 = stamped(docs0.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 150000000L).as("doc_id"),
            concat_ws(" ",
              slice(toks, lit(1), greatest(size(toks) - 6, lit(1)))).as("text")), 3)
        val input = stamped(docs0, 0).unionByName(nears1).unionByName(nears2)
          .unionByName(nears3)
        val topic = s"$work/topic_neardup"
        // ONE parquet file: the stream ≡ batch require below assumes
        // arrival order follows (event_time, doc_id), which the
        // processor's sort only guarantees WITHIN a micro-batch — a
        // multi-file topic could split a copy into an earlier
        // micro-batch than its original and flip which doc survives.
        input.coalesce(1).write.mode("overwrite").parquet(topic)
        val evalFps = docs0.filter(lit(false))
          .select(graft.ext.TextOps.contentFingerprint(col("text")).as("fp"))
        val n = spark.read.parquet(topic).count()
        val sink = s"$work/i_out"
        val tI = time {
          val q = graft.stream.Curate.curateNearDup(
              spark.readStream.schema(input.schema).parquet(topic), evalFps)
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", s"$work/i_ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        results(s"neardup_curate@${n / 1000}k") = n / tI
        val sIds = spark.read.parquet(sink)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val bIds = graft.stream.Curate.curateNearDupBatch(
            spark.read.parquet(topic), evalFps)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        require(sIds == bIds && sIds.nonEmpty,
          s"near-dup stream kept set (${sIds.size}) must equal batch " +
            s"survivor set (${bIds.size})")
        System.err.println(
          f"[stream-bench] neardup_curate@${n / 1000}k  $n rows  $tI%.1fs  " +
            f"${n / tI}%.0f rows/s  kept=${sIds.size}")
      } finally {
        spark.conf.set(partKey, prevPart)
        prevProv match {
          case Some(v) => spark.conf.set(provKey, v)
          case None    => spark.conf.unset(provKey)
        }
      }
    }

    // Mode I2: HOT-BUCKET probe for the per-bucket retention cap
    // (NearDup.BandDedupProcessor maxPerBucket — the streaming analog
    // of Dedup.MaxBandBucket). Topic = a boilerplate STORM: 8,000
    // near-dup variants of ONE base doc (base + a distinct tail
    // token, J ≈ 28/30 vs base AND vs each other), so the base doc's
    // band buckets each receive thousands of entries inside the TTL —
    // the exact degenerate shape the cap exists for. With cap=64 the
    // per-arrival comparison and the RocksDB list per bucket stay
    // O(cap); the probe records rows/s AND the state-store row count
    // from the query's progress so a state blowup fails loudly here
    // instead of OOMing a production job.
    locally {
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val partKey = "spark.sql.shuffle.partitions"
      val prevPart = spark.conf.get(partKey)
      spark.conf.set(partKey, "8")
      try {
        val nStorm = 8000
        val base = "the quick brown fox jumps over the lazy dog while " +
          "seventeen boilerplate navigation links repeat across every " +
          "page footer header sidebar copyright notice terms privacy"
        val storm = spark.range(nStorm)
          .select(col("id").as("doc_id"),
            concat(lit(base), lit(" tail"), col("id").cast("string")).as("text"),
            // later ids get later event_times (all inside the TTL) so
            // arrival order is construction-pinned, as in mode I
            timestamp_millis(lit(1767261600000L) + col("id")).as("event_time"))
        val topic = s"$work/topic_storm"
        storm.coalesce(1).write.mode("overwrite").parquet(topic)
        // numRowsTotal counts state-store KEYS (ListState entries are
        // RocksDB-merged under one key per bucket), so it bounds the
        // BUCKET population — the TTL's job — identically for both
        // runs; the cap's own engagement shows up as the per-arrival
        // comparison cost, i.e. rows/s (and is spec-gated
        // deterministically in CurateSpec's cap=2 eviction test).
        // Record BOTH runs so the artifact carries the win.
        def runStorm(cap: Int, tag: String): Unit = {
          val sink = s"$work/i2_out_$tag"
          var stateRows = -1L
          val tI2 = time {
            val q = graft.stream.NearDup.dedupNearDups(
                spark.readStream.schema(storm.schema).parquet(topic)
                  .withWatermark("event_time", "10 seconds"),
                threshold = 0.5, maxPerBucket = cap)
              .writeStream.format("parquet").option("path", sink)
              .option("checkpointLocation", s"$work/i2_ckpt_$tag")
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
            stateRows = q.recentProgress.reverse
              .find(p => p.stateOperators != null && p.stateOperators.nonEmpty)
              .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
          }
          val kept = spark.read.parquet(sink).count()
          // every variant near-dups the first arrival → exactly 1 doc
          // survives; bucket count is ~8 pure-base buckets + one
          // singleton per tail-influenced (variant, band) ≈ 1.05/doc —
          // 2×nStorm fails loudly if bucket population ever blows up
          require(kept == 1, s"storm must collapse to 1 survivor, kept=$kept")
          require(stateRows >= 0 && stateRows <= 2L * nStorm,
            s"hot-bucket state keys must stay TTL/population-bounded: " +
              s"$stateRows > ${2L * nStorm}")
          results(s"neardup_hotbucket_$tag@${nStorm / 1000}k") = nStorm / tI2
          System.err.println(
            f"[stream-bench] neardup_hotbucket_$tag@${nStorm / 1000}k  " +
              f"$nStorm rows  $tI2%.1fs  ${nStorm / tI2}%.0f rows/s  " +
              f"stateKeys=$stateRows cap=$cap")
        }
        runStorm(Int.MaxValue, "uncapped")
        runStorm(64, "cap64")
      } finally {
        spark.conf.set(partKey, prevPart)
        prevProv match {
          case Some(v) => spark.conf.set(provKey, v)
          case None    => spark.conf.unset(provKey)
        }
      }
    }

    // Mode J: STREAMING incremental curation (round 14) — the day-N
    // increment of the corpus capstone driven as a multi-micro-batch
    // stream against the PERSISTED day-N−1 state tables
    // (stream.IncCurate: the incrementalPairs broadcast-probe shape in
    // foreachBatch, with per-batch state extension and an IVM change
    // stream of keeps + retractions). The drain REQUIREs the folded
    // survivor set ≡ the batch capstone's packed id set on the same
    // increment — across REAL micro-batch boundaries (3 ascending-id
    // files, maxFilesPerTrigger = 1), so cross-batch state probes,
    // canonical merges, and retro-contamination retractions all
    // engage.
    locally {
      val partKey = "spark.sql.shuffle.partitions"
      val prevPart = spark.conf.get(partKey)
      spark.conf.set(partKey, "8")
      try {
        val sfDir = "/root/testdata/sf0.1"
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val prior = graft.ext.CorpusPipeline.cachedPriorState(docs, sfDir)
        val inc = graft.ext.CorpusPipeline.dayNIncrement(docs, prior)
          .select("doc_id", "text", "source").localCheckpoint(true)
        val n = inc.count()
        // Topic = 3 ascending doc_id ranges as separately-named files
        // (rename pins path order; sequential writes pin mtime order —
        // whichever the file source uses, arrival is id-ascending,
        // the IncCurate keep-first ≡ keep-min contract).
        val ids = inc.select("doc_id").orderBy("doc_id").collect()
          .map(_.getLong(0))
        val cuts = Seq(ids((ids.length / 3).toInt), ids((2 * ids.length / 3).toInt))
        val topic = s"$work/topic_inccurate"
        val fs = new org.apache.hadoop.fs.Path(topic)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(topic))
        val ranges = Seq(
          inc.filter(col("doc_id") < cuts(0)),
          inc.filter(col("doc_id") >= cuts(0) && col("doc_id") < cuts(1)),
          inc.filter(col("doc_id") >= cuts(1)))
        ranges.zipWithIndex.foreach { case (r, i) =>
          val tmp = s"$work/inccurate_tmp_$i"
          r.coalesce(1).write.mode("overwrite").parquet(tmp)
          val f = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
            .map(_.getPath).find(_.getName.endsWith(".parquet")).get
          fs.rename(f, new org.apache.hadoop.fs.Path(topic, f"inc-$i%02d.parquet"))
          Thread.sleep(1100) // distinct mtimes at 1s granularity
        }
        val sink = s"$work/j_out"
        val state = graft.stream.IncCurate.seed(prior)
        var nBatches = 0
        val tJ = time {
          val q = spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", 1).parquet(topic)
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$work/j_ckpt")
            .foreachBatch { (b: DataFrame, _: Long) =>
              nBatches += 1
              LakeSink(sink, partitionCols = Nil)
                .append(graft.stream.IncCurate.processBatch(b, state))
            }
            .start()
          q.awaitTermination()
        }
        require(nBatches >= 3, s"mode J must drain multi-batch, got $nBatches")
        val changes = spark.read.parquet(sink)
        val keeps = changes.filter(col("op") === "keep").select("doc_id")
        val retracts = changes.filter(col("op") === "retract").select("doc_id")
        val streamed = prior.survivors.select("doc_id").unionByName(keeps)
          .except(retracts)
        val batchPacked = graft.ext.CorpusPipeline
          .buildIncrementalStages(docs, prior).packed.select("doc_id")
        val onlyStream = streamed.except(batchPacked).count()
        val onlyBatch = batchPacked.except(streamed).count()
        val nStream = streamed.count()
        require(onlyStream == 0 && onlyBatch == 0 && nStream > 0,
          s"mode J survivor set must equal the batch capstone's packed " +
            s"ids: stream-only=$onlyStream batch-only=$onlyBatch n=$nStream")
        val stateRows = state.stateRows
        results(s"inc_curate@${n / 1000}k") = n / tJ
        System.err.println(
          f"[stream-bench] inc_curate@${n / 1000}k  $n rows  $tJ%.1fs  " +
            f"${n / tJ}%.0f rows/s  survivors=$nStream stateRows=$stateRows " +
            f"batches=$nBatches")
      } finally {
        spark.conf.set(partKey, prevPart)
      }
    }

    // Mode K: exactly-once snapshot-lake streaming sink (SnapshotSink
    // + Lake.appendIdempotent) — each micro-batch lands as ONE
    // txn-stamped lake commit; after the drain, a re-delivered final
    // batch (the at-least-once shape a restart produces) must be a
    // no-op against the log. rows/s = input messages / wall seconds
    // to drain multi-batch (maxFilesPerTrigger splits the topic).
    {
      // An 8-file copy of the 100k topic: maxFilesPerTrigger=2 then
      // yields a deterministic 4-batch drain however the producer laid
      // out the original files.
      val topic = s"$work/topic_k"
      spark.read.text(s"$work/topic_100k").repartition(8)
        .write.text(topic)
      val n = spark.read.text(topic).count()
      val lake = graft.io.Snapshot.Lake(spark, s"$work/k_lake")
      val tK = time {
        val src = Ingest.decode(
          spark.readStream.option("maxFilesPerTrigger", 2)
            .text(topic).withColumnRenamed("value", "raw"), col("raw"))
        val q = graft.stream.SnapshotSink.attach(
          Pipeline.rawRows(Pipeline.prepare(src)), lake, "bench-writer",
          s"$work/k_ckpt", trigger = Some(Trigger.AvailableNow()))
        q.awaitTermination()
      }
      val commits = lake.commits
      require(lake.read().count() == n,
        s"mode K lake must hold every streamed row: " +
          s"${lake.read().count()} of $n")
      require(commits.size >= 2 &&
        commits.forall(_.txn.exists(_._1 == "bench-writer")),
        s"mode K must drain multi-batch with txn-stamped commits, " +
          s"got ${commits.size}")
      // The restart replay: re-delivering the last committed batch id
      // must be recognized and skipped, leaving the table unchanged.
      val lastId = lake.lastTxn("bench-writer")
      require(lake.appendIdempotent(
          lake.read().limit(1), "bench-writer", lastId).isEmpty &&
        lake.read().count() == n,
        "mode K replayed batch must be a no-op")
      results("snapshot_sink@100k") = n / tK
      System.err.println(
        f"[stream-bench] snapshot_sink@100k  $n rows  $tK%.1fs  " +
          f"${n / tK}%.0f rows/s  commits=${commits.size}")
    }

    // Mode L: exactly-once streaming CDC apply (SnapshotSink.attachCdc
    // + Lake.applyCdcMor) — the Delta "MERGE in foreachBatch" pattern,
    // merge-on-read: a lake pre-seeded with 100k keyed rows takes a
    // ~35k-change compacted stream (20k updates, 10k deletes, 5k fresh
    // inserts; ONE row per key, so batching order cannot change the
    // final state); each micro-batch lands as ONE txn-stamped commit
    // that DV-masks its keys' old versions and appends its upserts —
    // no data file ever rewrites. Gates: final table ≡ the
    // batch-computed expected state (exceptAll both ways), multi-batch
    // txn-stamped drain, deletion vectors actually engaged, and the
    // restart replay is a no-op.
    {
      import spark.implicits._
      val lake = graft.io.Snapshot.Lake(spark, s"$work/l_lake",
        statsCols = Seq("k"))
      lake.append(spark.range(100000L).select(col("id").as("k"),
        col("id").as("v")))
      val changes = spark.range(100000L)
        .select(col("id").as("k"))
        .withColumn("line",
          when(pmod(col("k"), lit(10L)) === 3, concat_ws("\t",
            lit("delete"), col("k"), lit(0L)))
            .when(pmod(col("k"), lit(5L)) === 0, concat_ws("\t",
              lit("upsert"), col("k"), col("k") + 1000000L)))
        .filter(col("line").isNotNull)
        .select(col("line").as("value"))
        .unionByName(spark.range(100000L, 105000L).select(concat_ws("\t",
          lit("upsert"), col("id"), col("id") + 1000000L).as("value")))
      val topic = s"$work/topic_l"
      changes.repartition(8).write.text(topic)
      val nCh = spark.read.text(topic).count()
      val tL = time {
        val src = spark.readStream.option("maxFilesPerTrigger", 2)
          .text(topic)
          .select(split(col("value"), "\t").as("p"))
          .select(col("p").getItem(0).as("_op"),
            col("p").getItem(1).cast("long").as("k"),
            col("p").getItem(2).cast("long").as("v"))
        val q = graft.stream.SnapshotSink.attachCdc(src, lake, "k",
          "cdc-writer", s"$work/l_ckpt",
          trigger = Some(Trigger.AvailableNow()))
        q.awaitTermination()
      }
      val expected = spark.range(100000L)
        .filter(pmod(col("id"), lit(10L)) =!= 3)
        .select(col("id").as("k"),
          when(pmod(col("id"), lit(5L)) === 0, col("id") + 1000000L)
            .otherwise(col("id")).as("v"))
        .unionByName(spark.range(100000L, 105000L)
          .select(col("id").as("k"), (col("id") + 1000000L).as("v")))
      require(lake.read().exceptAll(expected).isEmpty &&
        expected.exceptAll(lake.read()).isEmpty,
        "mode L final lake must equal the batch-computed state")
      val txns = lake.commits.filter(_.txn.exists(_._1 == "cdc-writer"))
      require(txns.size >= 2,
        s"mode L must drain multi-batch, got ${txns.size}")
      require(lake.liveState(lake.latestVersion).exists(_._2.nonEmpty),
        "mode L must engage deletion vectors (masked old versions)")
      val lastId = lake.lastTxn("cdc-writer")
      val nBefore = lake.read().count()
      require(lake.applyCdcMor(
          Seq(("upsert", 0L, 123L)).toDF("_op", "k", "v"),
          "k", "cdc-writer", lastId).isEmpty &&
        lake.read().count() == nBefore,
        "mode L replayed batch must be a no-op")
      results(s"cdc_merge_stream@${nCh / 1000}k") = nCh / tL
      System.err.println(
        f"[stream-bench] cdc_merge_stream@${nCh / 1000}k  $nCh changes  " +
          f"$tL%.1fs  ${nCh / tL}%.0f rows/s  commits=${txns.size}")
    }

    // Mode M (round 15): streaming CHANGE-FEED consumption — the lake
    // mode K just wrote is re-read through the V2 source with
    // readChangeFeed=true, paced one commit per trigger under
    // AvailableNow, maintaining a per-commit-version change summary
    // downstream (the Delta CDF consumer pattern: version-tagged rows
    // drive incremental view maintenance without Lake.changes' batch
    // diff). Gates: the feed carries EVERY table row exactly once,
    // each tagged 'insert' with the commit version that added it
    // (per-version counts ≡ the log's per-commit manifest rows), and
    // the drain is paced multi-batch. rows/s = feed rows / wall
    // seconds.
    {
      // A 4-commit flat (k, v) lake — the V2 reader's primitive-column
      // contract (mode K's lake carries an INT96 timestamp it refuses).
      val lakeRoot = s"$work/m_lake"
      val lake = graft.io.Snapshot.Lake(spark, lakeRoot)
      (0 until 4).foreach(i => lake.append(
        spark.range(i * 25000L, (i + 1) * 25000L)
          .select(col("id").as("k"), (col("id") * 7).as("v"))))
      val n = lake.read().count()
      val perCommit = lake.commits
        .filter(_.added.nonEmpty)
        .map(c => c.version.toLong -> c.added.map(_.rows).sum).toMap
      val tM = time {
        val q = spark.readStream
          .format("graft.io.v2.SnapshotStreamSource")
          .option("readChangeFeed", "true")
          .option("maxCommitsPerTrigger", 1)
          .load(lakeRoot)
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("n_rows"))
          .writeStream.outputMode("complete")
          .format("memory").queryName("m_cdf")
          .option("checkpointLocation", s"$work/m_ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val agg = spark.table("m_cdf").collect()
      require(agg.map(_.getAs[Long]("n_rows")).sum == n,
        s"mode M feed must carry every table row: " +
          s"${agg.map(_.getAs[Long]("n_rows")).sum} of $n")
      require(agg.forall(_.getAs[String]("_change_type") == "insert"),
        "mode M append-only lake: every change is an insert")
      val got = agg.map(r => r.getAs[Long]("_commit_version") ->
        r.getAs[Long]("n_rows")).toMap
      require(got == perCommit,
        s"mode M per-version counts must match the log: $got vs $perCommit")
      require(perCommit.size >= 2, "mode M must span multiple commits")
      results("cdf_consume@100k") = n / tM
      System.err.println(
        f"[stream-bench] cdf_consume@100k  $n rows  $tM%.1fs  " +
          f"${n / tM}%.0f rows/s  versions=${perCommit.size}")
    }

    // Mode N (round 16): PACED LAKE-TO-LAKE INCREMENTAL ETL — the
    // reference's nightly bronze→silver batch (timescale_to_deltalake
    // .py's daily re-extract) re-expressed as a paced streaming
    // resume: bronze commits feed through the V2 source ONE COMMIT
    // PER TRIGGER (admission control) under Trigger.AvailableNow, a
    // silver curation transform runs per micro-batch, and the
    // txn-stamped sink lands each batch exactly once. The first drain
    // is CRASHED deterministically — an injected failure AFTER batch
    // 1's lake commit durably published but BEFORE the engine
    // checkpointed it (the exact at-least-once window a real restart
    // hits) — then resumed from the same checkpoint: the re-delivered
    // batch must be recognized by the silver log's txn stamp and
    // skipped. Gates: silver ≡ the batch-computed curation of bronze
    // (exceptAll both ways) after the crash-resume AND after a
    // nightly catch-up (4 more bronze commits, one AvailableNow
    // resume that picks up exactly the increment); every silver txn
    // batchId unique (nothing double-landed); both drains paced
    // multi-batch. 100 TB shape: each trigger's cost rides ONE bronze
    // commit's files — the nightly catch-up scans the increment,
    // never the table, and a mid-drain crash costs one skipped probe.
    {
      val bronzeRoot = s"$work/n_bronze"
      val bronze = graft.io.Snapshot.Lake(spark, bronzeRoot)
      (0 until 4).foreach(i => bronze.append(
        spark.range(i * 12500L, (i + 1) * 12500L)
          .select(col("id").as("k"), (col("id") * 3).as("v"))))
      val silver = graft.io.Snapshot.Lake(spark, s"$work/n_silver")
      def curate(df: org.apache.spark.sql.DataFrame) =
        df.filter(pmod(col("k"), lit(10L)) =!= 7)
          .select(col("k"), col("v"), (col("v") * 2 + 1).as("score"))
      def src() = spark.readStream
        .format("graft.io.v2.SnapshotStreamSource")
        .option("maxCommitsPerTrigger", 1)
        .load(bronzeRoot)
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val tN = time {
        // Phase 1: drain with the injected post-commit crash.
        val q1 = src().writeStream.outputMode("append")
          .option("checkpointLocation", s"$work/n_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            if (!batch.isEmpty) {
              silver.appendIdempotent(curate(batch), "nightly", id)
              ()
            }
            if (id == 1 && crashed.compareAndSet(false, true))
              throw new RuntimeException("mode N injected post-commit crash")
          }
          .start()
        try q1.awaitTermination()
        catch {
          case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
        }
        // Phase 2: resume from the same checkpoint — batch 1
        // re-delivers (at-least-once), the log skips it, the drain
        // completes.
        val q2 = graft.stream.SnapshotSink.attach(
          curate(src()), silver, "nightly", s"$work/n_ckpt",
          trigger = Some(Trigger.AvailableNow()))
        q2.awaitTermination()
      }
      require(crashed.get, "mode N injected crash must have fired")
      val expected1 = curate(bronze.read())
      require(silver.read().exceptAll(expected1).isEmpty &&
        expected1.exceptAll(silver.read()).isEmpty,
        "mode N crash-resume silver must equal the batch-computed curation")
      val ids1 = silver.commits.flatMap(_.txn)
        .filter(_._1 == "nightly").map(_._2)
      require(ids1.size >= 3 && ids1.distinct.size == ids1.size,
        s"mode N batchIds must land exactly once despite the replay: $ids1")
      // Nightly catch-up: new bronze commits, one paced resume.
      (4 until 8).foreach(i => bronze.append(
        spark.range(i * 12500L, (i + 1) * 12500L)
          .select(col("id").as("k"), (col("id") * 3).as("v"))))
      val txnsBefore = ids1.size
      val tN2 = time {
        val q3 = graft.stream.SnapshotSink.attach(
          curate(src()), silver, "nightly", s"$work/n_ckpt",
          trigger = Some(Trigger.AvailableNow()))
        q3.awaitTermination()
      }
      val expected2 = curate(bronze.read())
      require(silver.read().exceptAll(expected2).isEmpty &&
        expected2.exceptAll(silver.read()).isEmpty,
        "mode N catch-up silver must equal the batch-computed curation")
      val ids2 = silver.commits.flatMap(_.txn)
        .filter(_._1 == "nightly").map(_._2)
      require(ids2.distinct.size == ids2.size,
        s"mode N catch-up must not double-land: $ids2")
      require(ids2.size - txnsBefore >= 4,
        s"mode N catch-up must pace one commit per trigger: " +
          s"${ids2.size - txnsBefore} new commits for 4 bronze commits")
      val n = bronze.read().count()
      results("lake_etl_resume@100k") = n / (tN + tN2)
      System.err.println(
        f"[stream-bench] lake_etl_resume@100k  $n rows  ${tN + tN2}%.1fs  " +
          f"${n / (tN + tN2)}%.0f rows/s  txns=${ids2.size} (crash+resume+catchup)")
    }

    // Mode O (round 17): RocksDB STATE STORE PROVIDER — proves the
    // off-heap state claim (README scale design): the SAME
    // watermarked 1-minute tumbling aggregation (Pipeline's F1 state
    // shape) drains the 100k topic once under the default
    // HDFS-backed (JVM-heap) provider and once under
    // RocksDBStateStoreProvider (native/off-heap — the production
    // choice when open-window state outgrows the executor heap).
    // Gate: the two finalized-window result sets are EXACTLY equal
    // (exceptAll both ways) — the provider is a storage swap, never a
    // semantics change; both drain rates are recorded. 100 TB shape:
    // per-task state lives in RocksDB SSTs on local disk, so state is
    // disk-bounded rather than heap-bounded, and snapshots ride the
    // same checkpoint contract (changelog checkpointing is a config
    // away on real clusters).
    {
      val topic = s"$work/topic_100k"
      val n = spark.read.text(topic).count()
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      def drain(tag: String, provider: Option[String]): (Double, DataFrame) = {
        val prior = spark.conf.getOption(providerKey)
        provider match {
          case Some(p) => spark.conf.set(providerKey, p)
          case None => spark.conf.unset(providerKey)
        }
        val out = LakeSink(s"$work/o_$tag/agg", partitionCols = Nil)
        val t = time {
          val q = Pipeline.windowedAggregates(
              Pipeline.prepare(JsonDirSource(topic).readStream(spark)))
            .writeStream.outputMode("append")
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$work/o_$tag/ckpt")
            .foreachBatch { (b: DataFrame, _: Long) => out.append(b) }
            .start()
          q.awaitTermination()
        }
        prior match {
          case Some(p) => spark.conf.set(providerKey, p)
          case None => spark.conf.unset(providerKey)
        }
        (t, out.read(spark))
      }
      val (tHeap, heapRows) = drain("heap", None)
      val (tRocks, rocksRows) = drain("rocksdb", Some(
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"))
      require(heapRows.count() > 0, "mode O drained no windows")
      require(heapRows.exceptAll(rocksRows).isEmpty &&
        rocksRows.exceptAll(heapRows).isEmpty,
        "mode O: RocksDB-backed windows must equal the heap-backed run")
      results("state_heap@100k") = n / tHeap
      results("state_rocksdb@100k") = n / tRocks
      System.err.println(
        f"[stream-bench] state_heap@100k  $n rows  $tHeap%.1fs  " +
          f"${n / tHeap}%.0f rows/s; state_rocksdb@100k  $tRocks%.1fs  " +
          f"${n / tRocks}%.0f rows/s  (results equal)")
    }

    // Mode P (round 18): STREAMING CHANGE DATA FEED over a MUTATING
    // lake — writer-side change files (Lake(changeDataFeed = true))
    // served through the V2 CDF stream. The lake takes one 200k-row
    // base append, then 8 mutating commits (alternating MOR deletes
    // and MOR upserts on residue classes), each persisting its change
    // rows at write time. Gate: the drained stream is EXACTLY equal
    // (exceptAll both ways) to the batch changesByVersion feed over
    // the same window — stream ≡ batch is the design's construction,
    // and this asserts it end-to-end through the connector. rows/s =
    // total change rows / drain wall. 100 TB shape: each micro-batch
    // reads only its commit's change files (file-local, no diff at
    // read time); the write side pays one increment-bounded diff per
    // mutating commit (SCALE.md round-18 probe: FLAT 1×→10×).
    {
      import graft.io.Snapshot
      val base = spark.range(200000L).select(col("id").as("k"),
        pmod(col("id"), lit(16L)).as("machine"),
        concat(lit("r"), col("id")).as("payload"))
        .localCheckpoint(true)
      val lake = Snapshot.Lake(spark, s"$work/p_lake",
        statsCols = Seq("k"), changeDataFeed = true)
      lake.append(base) // v0
      (1 to 4).foreach { i =>
        lake.deleteKeysMor(base.filter(
          pmod(col("k"), lit(97L)) === i.toLong).select("k"), "k")
        lake.upsertMor(base.filter(
            pmod(col("k"), lit(101L)) === i.toLong)
          .withColumn("payload", concat(lit("u"), col("payload"))), "k")
      }
      val head = lake.latestVersion
      val name = s"sbp${System.nanoTime()}"
      val tP = time {
        val q = spark.readStream
          .format("graft.io.v2.SnapshotStreamSource")
          .option("readChangeFeed", "true").load(lake.root)
          .writeStream.outputMode("append").format("memory")
          .queryName(name)
          .option("checkpointLocation", s"$work/p_ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val streamed = spark.table(name)
      val batch = lake.changesByVersion(-1, head)
        .select(streamed.columns.map(col).toSeq: _*)
      require(streamed.count() > 200000L, "mode P drained too few rows")
      require(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        "mode P: the CDF stream must equal batch changesByVersion")
      val nP = streamed.count()
      results("cdf_stream@200k") = nP / tP
      System.err.println(
        f"[stream-bench] cdf_stream@200k  $nP change rows  $tP%.1fs  " +
          f"${nP / tP}%.0f rows/s  (stream == batch)")
    }

    val modes = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.0f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_rows_per_sec","modes":$modes,""" +
      s""""loadavg_start":"$loadStart","loadavg_end":"${readLoad()}","work":"$work"}""")
    spark.stop()
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def readLoad(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).mkString(",")
      finally src.close()
    } catch { case _: Throwable => "unavailable" }
}
