package graft

import org.apache.spark.sql.SparkSession

/** Scratch phase-timer for the streaming harness queries (not part of the
  * declared surface): breaks gtfs_stream_records / dedup_stream cost into
  * phases so optimization effort lands where the time is. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // job-level accounting: every Spark job's wall time + description, so
    // the micro-batch's cost splits into named jobs vs framework gaps
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short"))).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) jobs.add((je.jobId, System.nanoTime() - s._1, s._2))
      }
    })
    def drainJobs(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val all = jobs.asScala.toSeq.sortBy(_._1)
      jobs.clear()
      println(s"[jobs:$label] n=${all.size} " +
        f"sum=${all.map(_._2).sum / 1e9}%.3f s")
      all.foreach { case (id, ns, d) =>
        println(f"[jobs:$label]   #$id%-4d ${ns / 1e9}%7.3f  ${d.take(90)}") }
    }
    // section filter (gtfs | dedup | dedup_phases), default all
    val ops = sys.env.getOrElse("SPARK_GRAFT_PROBE_OPS", "gtfs,dedup,dedup_phases")
      .split(',').map(_.trim).toSet
    // warm the fixture pipeline (same shared state the bench setup builds)
    if (ops("gtfs"))
      t("pipeline_setup")(graft.queries.GtfsPack.predictionState(spark))
    if (ops("gtfs")) (1 to 2).foreach { i =>
      println(s"--- round $i: gtfs_stream_records phases ---")
      val (sched, _) = graft.queries.GtfsPack.predictionState(spark)
      val rtDir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        "/graft_gtfs_fixture_v1/rt" // FixtureLocator's stable location
      val base = graft.queries.Scratch.tempDir("graft_probe").toString
      val recordsDir = base + "/records"
      try {
        val lease = t("lease_acquire")(
          graft.gtfs.WriterLease.acquire(spark, recordsDir))
        try {
          t("gc_retired")(graft.gtfs.LwwTable.gcRetired(spark, recordsDir, 0L))
          drainJobs("pre")
          val q = t("stream_start")(graft.streaming.StreamingImport.start(
            spark, rtDir, sched, "graft", recordsDir, base + "/ckpt",
            automatic = false, maxFilesPerTrigger = 256))
          t("await_termination")(require(q.awaitTermination(300000)))
          drainJobs("microbatch")
          t("compact")(graft.gtfs.RecordsTable.compact(spark, recordsDir, graceMs = 0L))
          drainJobs("compact")
        } finally lease.release()
        val out = t("read_back")(
          graft.gtfs.RecordsTable.read(spark, recordsDir))
        t("collect")(out.orderBy("source", "trip_start_date", "trip_id",
          "trip_start_time", "stop_sequence").collect().length)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
    if (ops("dedup")) (1 to 2).foreach { i =>
      println(s"--- round $i: dedup_stream full ---")
      t("dedup_stream_query")(
        SparkEntry.queries("dedup_stream")(spark, "/root/testdata/sf0.1").count())
    }
    // state-store A/B knobs for the phase runs (probe-only; the declared
    // query is untouched): SPARK_GRAFT_PROBE_STATE_PROVIDER sets
    // spark.sql.streaming.stateStore.providerClass,
    // SPARK_GRAFT_PROBE_STATE_PARTS sets spark.sql.shuffle.partitions for
    // the stream (state partition count is pinned at first batch)
    sys.env.get("SPARK_GRAFT_PROBE_STATE_PROVIDER").foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    sys.env.get("SPARK_GRAFT_PROBE_STATE_PARTS").foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))
    if (ops("dedup_phases")) (1 to 2).foreach { i =>
      println(s"--- round $i: dedup_stream phases ---")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      val base = graft.queries.Scratch.tempDir("graft_probe_ds")
      val srcDir = base.toString + "/src"
      t("src_write")(docs.write.mode("overwrite").parquet(srcDir))
      val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
        .withColumn("ts", timestamp_micros(col("doc_id") + lit(1700000000000000L)))
      val sink = "probe_sink_" + i
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val q = t("stream_start")(
        graft.streaming.StreamingDedup.exactStream(stream)
          .select(md5(col("text")).as("text_md5"))
          .writeStream.format("memory").queryName(sink)
          .option("checkpointLocation", base.toString + "/ckpt")
          .trigger(Trigger.AvailableNow()).start())
      t("await")(require(q.awaitTermination(300000)))
      println(s"[probe] batches=${q.recentProgress.length} " +
        q.recentProgress.map(p => s"${p.numInputRows}r/${p.batchDuration}ms")
          .mkString(" "))
      q.recentProgress.foreach { p =>
        println(s"[probe] durationMs=${p.durationMs}")
        p.stateOperators.foreach(so => println(
          s"[probe] state op=${so.operatorName} rows=${so.numRowsTotal} " +
            s"commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}"))
      }
      t("collect")(spark.table(sink).orderBy("text_md5").collect().length)
      spark.catalog.dropTempView(sink)
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
    spark.stop()
  }
}
