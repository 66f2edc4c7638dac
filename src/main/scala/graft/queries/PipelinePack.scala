package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, MediaAsset, Packing, Sampling, Similarity, TextAnalysis, Multimodal}
import graft.functions.RollingFingerprint

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over the `documents` and `embeddings` tables. Exact and
  * SQL-expressible variants carry DuckDB oracles; the LSH/SimHash/stub paths
  * are rows-only here and quality-tested in PipelineOpsSpec.
  */
object PipelinePack extends QueryPack {
  import Tables.t

  private val QueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  // shared intermediate results (shingle index, pair sets, top-k lists):
  // several queries consume each one — compute once per (session, sfDir),
  // so e.g. the LSH-vs-exact invariant reuses the pair sets its two sibling
  // queries already built instead of recomputing both pipelines
  // per-key lazy thunks instead of one pack-wide lock: distinct keys build
  // CONCURRENTLY (prewarm overlaps the independent phases on the shared
  // scheduler) while same-key callers still block on a single evaluation
  // (the lazy cell's initializer monitor)
  private val memo = scala.collection.concurrent
    .TrieMap[(SparkSession, String, String), () => DataFrame]()
  private def cached(s: SparkSession, dir: String, key: String)
                    (build: => DataFrame): DataFrame = {
    // same eviction as MonitorPack.cached: long-lived JVMs create several
    // sessions — drop entries whose session is stopped so the map can't
    // leak cached plans across sessions
    memo.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
    val thunk = memo.getOrElseUpdate((s, dir, key), {
      // localCheckpoint over cache: consumers re-analyze a merely-cached
      // plan's full lineage on every derived op (same rationale as
      // GtfsPack.predictionState, measured there at ~0.5 s/query)
      lazy val v: DataFrame = build.localCheckpoint()
      () => v
    })
    thunk()
  }

  // the 3-gram shingle inverted index feeds every near-dup query
  private def shingles(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "shingles")(
      Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", 3, 100))

  private def ngramPairs(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "ngram_pairs")(
      Dedup.ngramJaccardFromShingles(shingles(s, dir), threshold = 0.5))

  private def lshPairs(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "lsh_pairs")(
      Dedup.minhashLshFromShingles(shingles(s, dir), numHashes = 32, bands = 8,
        threshold = 0.5))

  private def bruteTopk(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "brute_topk")(
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), QueryIds, k = 10))

  // 12 tables × 4 planes: per-table match prob q=(1-θ/π)^4, union recall
  // 1-(1-q)^12 — 8 tables left one sf0.01 query at 4/10 recall, 12 clears
  // the ≥5/10 invariant with margin
  private def lshTopk(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "lsh_topk")(
      Similarity.lshTopK(t(s, dir, "embeddings"), QueryIds, k = 10,
        numTables = 12, planesPerTable = 4))

  // 16 cells × 4 probes: each query exactly re-scores ~1/4 of the corpus
  private def ivfTopk(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "ivf_topk")(
      Similarity.ivfTopK(t(s, dir, "embeddings"), QueryIds, k = 10,
        nCells = 16, nProbe = 4, iters = 3))

  /** Builds the shared caches ahead of timing (Bench's setup phase) so
    * per-query bench numbers reflect marginal cost: the shingle index, the
    * two near-dup pair sets and the three ANN top-k lists — each consumed
    * by at least two queries (pairs + clusters + the LSH-vs-exact
    * invariant; every top-k by its result query AND its recall check). */
  /** Wall seconds per prewarm phase (same role as GtfsPack.setupTimings). */
  val setupTimings = scala.collection.concurrent.TrieMap[String, Double]()
  private def timed(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    setupTimings.put(name, (System.nanoTime() - t0) / 1e9)
  }

  def prewarm(s: SparkSession, dir: String): Unit = {
    timed("shingle_idx")(shingles(s, dir))
    // downstream families are mutually independent — overlap them (per-key
    // lazy `cached` keeps each build single); timings are in-thread walls,
    // so they overlap and sum past the phase's wall
    Par.all(
      "ngram_pairs" -> (() => timed("ngram_pairs")(ngramPairs(s, dir))),
      "lsh_pairs" -> (() => timed("lsh_pairs")(lshPairs(s, dir))),
      "ann_brute" -> (() => timed("ann_brute")(bruteTopk(s, dir))),
      "ann_lsh" -> (() => timed("ann_lsh")(lshTopk(s, dir))),
      "ann_ivf" -> (() => timed("ann_ivf")(ivfTopk(s, dir))),
      "curate" -> (() => timed("curate")(curatedDocs(s, dir))))
  }

  /** Aux inputs for the outDir-based DuckDB oracles (written by Verify under
    * `outDir/_aux/`): the df-capped shingle index, the 32 seeded MinHash
    * values per distinct shingle, per-occurrence token hashes (SimHash
    * input), and the seeded ANN hyperplanes. The raw 64-bit hashes are
    * Spark-computed (DuckDB has no xxhash64); the oracles verify everything
    * DOWNSTREAM — signature aggregation, banding, candidate joins,
    * similarity verification, ranking. */
  def oracleAux(s: SparkSession, dir: String): Map[String, DataFrame] = {
    import s.implicits._
    val sh = shingles(s, dir)
    val seeded = sh.select("shingle").distinct()
      .select(col("shingle") +:
        (0 until 32).map(i => xxhash64(lit(i), col("shingle")).as(s"h$i")): _*)
    val tokenHashes = t(s, dir, "documents")
      .select(col("doc_id").as("doc"),
        explode(TextAnalysis.tokensCol(col("text"))).as("tok"))
      .select(col("doc"), xxhash64(col("tok")).as("h"))
    val planes = for {
      tbl <- 0 until 12
      (plane, idx) <- Similarity.hyperplanes(64, 4, seed = 42L + tbl).zipWithIndex
    } yield (tbl, idx, plane.toSeq)
    // the near-dup pair op auto-sizes its plane count from the corpus (see
    // Similarity.autoPlanesPerTable) — dump exactly the planes it resolved
    // so the oracle replays the same bucketing without a data-dependent
    // parameter in the SQL string
    val ndK = Similarity.autoPlanesPerTable(t(s, dir, "embeddings").count())
    val ndPlanes = for {
      tbl <- 0 until 12
      (plane, idx) <- Similarity.hyperplanes(64, ndK, seed = 42L + tbl).zipWithIndex
    } yield (tbl, idx, plane.toSeq)
    // Multimodal decode truth: per synthesized asset, the metadata DECLARED
    // at encode time (width/height/rate/duration before the bytes were laid
    // down) plus payload stats recomputed by an independent fold — the
    // mm_features oracle selects straight from this table, so the header
    // decode must round-trip every declared value to pass.
    val mmTruth = sharedAssets(s, dir).map { a =>
        val n = a.payload.length
        val f0 = if (n == 0) 0f
                 else a.payload.count(b => ((b & 0xff) >> 4) == 0).toFloat / n
        val frames = if (n == 0) 0 else (n + 31) / 32
        val (dw, dh, rate, dur) = a.mime match {
          case "image/png" => (a.width, a.height, -1, -1L)
          case "audio/wav" => (-1, -1, 8000, a.duration_ms)
          case _           => (-1, -1, -1, a.duration_ms)
        }
        // encode-time PCM truth from the KNOWN synthesis layout (12-byte
        // RIFF + 24-byte fmt + 8-byte data header = samples start at 44) —
        // deliberately NOT the chunk walker the decode side uses, so a
        // walker bug shows up as a value diff
        val pcm = if (a.mime != "audio/wav") -1.0 else {
          val d = a.payload.drop(44)
          if (d.length < 2) -1.0
          else {
            var sum = 0L; var i = 0
            while (i + 1 < d.length) {
              sum += math.abs(((d(i + 1) << 8) | (d(i) & 0xff)).toShort.toLong)
              i += 2
            }
            BigDecimal(sum.toDouble / (d.length / 2))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
        (a.asset_id, a.mime, n, frames,
          BigDecimal(f0.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          dw, dh, rate, dur, pcm, true)
      }.toDF("asset_id", "mime", "n_bytes", "frames_sampled", "feat_0",
        "decoded_width", "decoded_height", "sample_rate", "decoded_duration_ms",
        "pcm_mean_abs", "parse_ok")
    // the fitted IVF coarse quantizer (deterministic: seeded init + DECIMAL
    // mean aggregation) — the ivf oracle re-derives assignment/probing from it
    val ivfCentroids = Similarity
      .kMeansCentroids(t(s, dir, "embeddings"), nCells = 16, iters = 3, dim = 64)
      .zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    // raw synthesized containers (payload BLOB + declared dims): the resize
    // oracle re-derives every output pixel from the hex-dumped DECODED
    // pixel stream (mm_pixels) — the zlib inflate itself is pinned by the
    // deflate→inflate round-trip test, everything downstream (channel
    // indexing, nearest-neighbor math, summary scalars) replays in SQL
    val mmAssets = sharedAssets(s, dir).toDF()
      .select("asset_id", "mime", "payload", "width", "height")
    val mmPixels = sharedAssets(s, dir)
      .flatMap(a => graft.ops.MediaCodec.pngPixels(a.payload)
        .filter(_.nonEmpty).map(px => (a.asset_id, px)))
      .toDF("asset_id", "raw")
    Map(
      "shingles" -> sh.select("doc", "shingle"),
      "minhash_seeded" -> seeded,
      "doc_token_hashes" -> tokenHashes,
      "ann_planes" -> planes.toDF("tbl", "plane_idx", "plane"),
      "ann_nd_planes" -> ndPlanes.toDF("tbl", "plane_idx", "plane"),
      "ivf_centroids" -> ivfCentroids,
      "mm_truth" -> mmTruth,
      "mm_assets" -> mmAssets,
      "mm_pixels" -> mmPixels)
  }

  // ---- dedup -------------------------------------------------------------
  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents")).orderBy("doc_id")

  private def dedupNgram(s: SparkSession, dir: String): DataFrame =
    ngramPairs(s, dir).orderBy("a", "b")

  /** Substring-level dedup (Lee et al. 2022): maximal duplicated token
    * spans across the corpus, 5-gram windows, ≥2 occurrences. The spans
    * memoize (both the span query and the strip pass consume them), over a
    * memoized positional window index (read twice by the detection —
    * occurrence count + join back). */
  private def dupSpansQ(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "dup_spans") {
      Dedup.dupSpansFromWins(
        cached(s, dir, "dup_wins")(
          Dedup.docWindows(t(s, dir, "documents"), "doc_id", "text", n = 5)),
        n = 5, minCount = 2)
    }

  private def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    dupSpansQ(s, dir).orderBy("doc_id", "span_start")

  /** The curation pass over the spans: duplicated text stripped per doc. */
  private def dedupSubstringStrip(s: SparkSession, dir: String): DataFrame =
    Dedup.stripFromSpans(t(s, dir, "documents"), dupSpansQ(s, dir))
      .orderBy("doc_id")

  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, dir).orderBy("a", "b")

  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "simhash_pairs")(
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3))
      .orderBy("a", "b")

  /** LSH soundness invariant, driver-checkable: LSH verifies its candidates
    * with the exact Jaccard formula, so its pairs are a SUBSET of the exact
    * n-gram pairs at the same threshold — the difference must be empty
    * (0 rows, matched against a WHERE-false oracle). */
  private def dedupLshVsExact(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, dir).select("a", "b")
      .except(ngramPairs(s, dir).select("a", "b"))
      .orderBy("a", "b")

  // ---- similarity --------------------------------------------------------
  private def annBrute(s: SparkSession, dir: String): DataFrame =
    bruteTopk(s, dir).orderBy("query_id", "rank")

  private def annLsh(s: SparkSession, dir: String): DataFrame =
    lshTopk(s, dir).orderBy("query_id", "rank")

  /** ANN-LSH recall invariant, driver-checkable: per query, the LSH top-10
    * must recover ≥ 5 of the exact brute-force top-10 (the hyperplanes are
    * seeded → deterministic). Emits the VIOLATING queries — must be 0 rows,
    * matched against a WHERE-false oracle. */
  private def annLshRecall(s: SparkSession, dir: String): DataFrame =
    recallViolations(annBrute(s, dir), annLsh(s, dir), minHits = 5)

  private def annIvf(s: SparkSession, dir: String): DataFrame =
    ivfTopk(s, dir).orderBy("query_id", "rank")

  /** Embedding-cosine near-dup pairs (dedup family, over the same LSH
    * tables the ANN path uses; 0.4 is well inside the non-vacuous range on
    * the synthetic embeddings — ~50 exact pairs at sf0.01). */
  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "dedup_embedding")(
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.4))
      .orderBy("a", "b")

  /** IVF recall invariant — AGGREGATE across queries, not per query: the
    * synthetic embeddings are near-uniform at 64 dims (no cluster
    * structure), so per-query recall at nProbe/nCells = 1/4 of the corpus
    * is high-variance by nature; the probed-fraction baseline is 25 % and
    * the fitted cells deliver ~52 % in aggregate. The 30 % floor (15 of 50)
    * catches structural breakage — a wrong cell join or empty candidate set
    * lands near 0 — while exact values are pinned by the full ann_ivf_topk
    * oracle. Must be 0 rows. */
  private def annIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val brute = annBrute(s, dir).select(col("query_id"), col("match_id"))
    val ivf = annIvf(s, dir).select(col("query_id"), col("match_id"))
      .withColumn("hit", lit(1))
    brute.join(ivf, Seq("query_id", "match_id"), "left")
      .agg(sum(coalesce(col("hit"), lit(0))).as("total_hits"))
      .filter(col("total_hits") < 15)
  }

  private def recallViolations(brute: DataFrame, approx: DataFrame,
                               minHits: Int): DataFrame =
    brute.select(col("query_id"), col("match_id"))
      .join(approx.select(col("query_id"), col("match_id"))
        .withColumn("hit", lit(1)), Seq("query_id", "match_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .filter(col("n_hits") < minHits)
      .orderBy("query_id")

  /** Near-dup clusters over the n-gram Jaccard pair graph (reuses the
    * cached pair set the sibling queries built). */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    // memoized like simhash_pairs: the label-propagation loop runs its
    // per-round driver actions on every call otherwise
    cached(s, dir, "dedup_clusters")(
      Dedup.clusters(t(s, dir, "documents"), ngramPairs(s, dir)))
      .orderBy("doc_id")

  /** English is the dominant stratum on the synthetic corpus — downsample it
    * to 40 %, keep everything else, and assign 80/10/10 splits. */
  private val StratumRates = Map("en" -> 40)
  private def sampleSplit(s: SparkSession, dir: String): DataFrame =
    Sampling.assign(t(s, dir, "documents"),
        TextAnalysis.langIdCol(col("text")), StratumRates, defaultPct = 100)
      .orderBy("doc_id")

  private def textVocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(t(s, dir, "documents"), topN = 100)

  private def textBigrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramPairs(t(s, dir, "documents"), topN = 50)

  private def textCommonRatio(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.commonTokenBpCol(t(s, dir, "documents"), vocabN = 100)
      .orderBy("doc_id")

  /** Concat-and-chunk packing into 2048-token training sequences. */
  private def packSequences(s: SparkSession, dir: String): DataFrame =
    Packing.concatChunkPack(t(s, dir, "documents"), budget = 2048)
      .orderBy("doc_id")

  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.dupNgramFracCol(col("text"), 3).as("dup_3gram_frac"))
      .orderBy("doc_id")

  private def corpusReport(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusReport(t(s, dir, "documents"))
      .orderBy("lang", "source")

  /** Decontamination sweep: src0 plays the held-out benchmark; every other
    * doc sharing an 8-gram with it gets flagged. */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contamination(docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), n = 8)
      .orderBy("doc_id")
  }

  // ---- text analysis -----------------------------------------------------
  private def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCountCol(col("text")).as("n_tokens"),
      round(TextAnalysis.avgTokenLenCol(col("text")), 4).as("avg_token_len"),
      round(TextAnalysis.punctRatioCol(col("text")), 4).as("punct_ratio"),
      TextAnalysis.qualityScoreCol(col("text")).as("quality"))
      .orderBy("doc_id")

  // BPE-ish regex token count: letter runs / digit runs / punctuation runs
  // (the RE2-safe subset so the DuckDB oracle uses the identical pattern)
  private def textTokensBpe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      size(filter(split(col("text"), "\\s+"), x => x =!= ""))
        .as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .as("bpe_tokens"))
      .orderBy("doc_id")

  private def textLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), TextAnalysis.langIdCol(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), RollingFingerprint(col("text"), 16).as("fingerprint"))
      .orderBy("doc_id")

  /** Streaming exact dedup run to completion over the documents table
    * (AvailableNow). Which COPY of a duplicate text survives depends on
    * partition arrival order, so the checkable output is the distinct-text
    * md5 set — identical no matter which copy won. */
  private def dedupStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = t(s, dir, "documents")
    val base = Scratch.tempDir("graft_dedup_stream")
    val srcDir = base.toString + "/src"
    docs.write.mode("overwrite").parquet(srcDir)
    // synthetic event time, offset well past epoch: the initial watermark is
    // epoch-0 and a row timestamped exactly at it is dropped as late
    val stream = s.readStream.schema(docs.schema).parquet(srcDir)
      .withColumn("ts", timestamp_micros(col("doc_id") + lit(1700000000000000L)))
    val sinkName = "dedup_stream_sink_" + java.util.UUID.randomUUID
      .toString.replace("-", "")
    // no-data micro-batches OFF for this run-to-completion query:
    // dropDuplicatesWithinWatermark emits each surviving row in the batch
    // it ARRIVES (append mode), so after the data batch the sink is already
    // complete — the extra 0-row batch AvailableNow otherwise schedules
    // exists only to evict state that is torn down lines later (measured:
    // the empty batch cost as much as the data batch, ~1.1 s of 2.4). A
    // LONG-RUNNING production dedup stream must keep the default ON — the
    // no-data batches are what expire state between bursts. The conf is
    // snapshotted at query START, so the bracket only needs to span
    // .start(); bench/verify run queries sequentially, so nothing else
    // starts a stream inside the bracket.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndPrev = s.conf.get(ndKey)
    // SCALE-ADAPTIVE state width (guide §2.2: size partitions by data, not
    // by the core-count constant): the state store pays a ~100-150 ms FIXED
    // commit cost per partition per batch (StreamProbe: commitTimeMs 8.8 s
    // CPU across the session's 32 partitions for ~5k keys; 0.8 s at 8; 0.07 s
    // at 1 — identical results, the dedup key set is partition-invariant).
    // Derive the stream's shuffle width from the SOURCE SIZE at one
    // partition per 64 MB, capped by the session width so a corpus-scale
    // source keeps the session's full parallelism — the constant-width
    // session conf stays untouched for every batch query. RocksDB provider
    // A/B'd and rejected (addBatch 0.78 s → 4-5 s on this state size).
    val spKey = "spark.sql.shuffle.partitions"
    val spPrev = s.conf.get(spKey)
    val srcBytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(base.resolve("src").toFile)
    val streamParts = math.max(1L,
      math.min(spPrev.toLong, srcBytes / (64L << 20) + 1)).toString
    val q = try {
      s.conf.set(ndKey, "false")
      s.conf.set(spKey, streamParts)
      graft.streaming.StreamingDedup.exactStream(stream)
        .select(md5(col("text")).as("text_md5"))
        .writeStream.format("memory").queryName(sinkName)
        .option("checkpointLocation", base.toString + "/ckpt")
        .trigger(Trigger.AvailableNow()).start()
    } finally { s.conf.set(ndKey, ndPrev); s.conf.set(spKey, spPrev) }
    // materialize the bounded result (distinct text hashes) on the driver so
    // the temp source/checkpoint dirs and the memory sink can be torn down —
    // teardown runs on the FAILURE path too (a timed-out query must be
    // stopped, not left writing into an orphaned sink and scratch dir)
    try {
      // require, not assert: assert is elidable, and eliding it would drop
      // the awaitTermination call itself and read a partial sink
      require(q.awaitTermination(300000), "dedup stream did not finish in 5 min")
      val result = s.table(sinkName).orderBy("text_md5")
      val schema = result.schema
      val rows = result.collect().toIndexedSeq
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema)
    } finally {
      if (q.isActive) q.stop()
      try s.catalog.dropTempView(sinkName) catch { case _: Exception => () }
      org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
    }
  }

  /** The END-TO-END curation pipeline in one declarative plan — what a
    * training-data user actually ships: keep real-language docs, gate on
    * quality and repetition, collapse near-dup clusters to their canonical
    * doc, drop eval-contaminated docs and the benchmark itself, then apply
    * the stratified sample and split assignment. Every stage is an operator
    * with its own oracle; this query proves they compose (one plan, shared
    * caches, semi/anti joins instead of materialized intermediates). */
  private def curatedDocs(s: SparkSession, dir: String): DataFrame =
    cached(s, dir, "pipeline_curate")(pipelineCurate(s, dir))

  private def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val kept = Dedup.clusters(docs, ngramPairs(s, dir))
      .filter(col("is_kept")).select("doc_id")
    val contaminated = Dedup.contamination(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), n = 8)
      .select("doc_id")
    docs
      .withColumn("lang_pred", TextAnalysis.langIdCol(col("text")))
      .withColumn("quality", TextAnalysis.qualityScoreCol(col("text")))
      .withColumn("repetition", TextAnalysis.dupNgramFracCol(col("text"), 3))
      .filter(col("lang_pred") =!= "und")
      .filter(col("quality") >= 0.2 && col("repetition") <= 0.5)
      .filter(col("source") =!= "src0") // the benchmark is not training data
      .join(kept, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .filter(Sampling.stratifiedKeepCol(col("doc_id"), col("lang_pred"),
        StratumRates, defaultPct = 100))
      .select("doc_id", "lang_pred", "quality", "repetition", "split")
      .orderBy("doc_id")
  }

  /** The SQL predicate every curation stage contributes — shared between the
    * pipeline_curate oracle and the curate→pack composition. */
  private def curateWhereSql: String = s"""
        ${TextAnalysis.duckDbLangIdSql("text")} <> 'und'
        AND ${TextAnalysis.duckDbQualitySql("text")} >= 0.2
        AND ${TextAnalysis.duckDbDupNgramFracSql("text", 3)} <= 0.5
        AND source <> 'src0'
        AND doc_id IN (SELECT doc_id FROM (
              ${Dedup.duckDbClustersSql("documents", 3, 0.5, 100, "doc_id", "text")})
              WHERE is_kept)
        AND doc_id NOT IN (SELECT doc_id FROM (
              ${Dedup.duckDbContaminationSql("documents", "source <> 'src0'",
                  "source = 'src0'", 8, "doc_id", "text")}))
        AND ${Sampling.duckDbStratifiedKeepSql("doc_id",
              TextAnalysis.duckDbLangIdSql("text"), StratumRates, 100)}"""

  /** Curate → pack: the pipeline's end product — curated docs chunked into
    * 2048-token training sequences. */
  private def pipelineCuratePack(s: SparkSession, dir: String): DataFrame = {
    // the curated corpus is shared with the pipeline_curate query through the
    // memo — re-deriving it here would replay the whole iterative clustering
    // chain (a sequence of Spark actions, not one lazy plan) per invocation
    val curatedIds = curatedDocs(s, dir).select("doc_id")
    val curated = t(s, dir, "documents").join(curatedIds, Seq("doc_id"), "left_semi")
    Packing.concatChunkPack(curated, budget = 2048).orderBy("doc_id")
  }

  // ---- multimodal (real container-header decode) -------------------------
  // one synthesized-asset pass shared by the mm queries and their aux dumps
  // (five call sites previously each re-ran the full synthesis job)
  private def sharedAssets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    cached(s, dir, "mm_assets")(
      Multimodal.synthesizeAssets(s, t(s, dir, "documents")).toDF()).as[MediaAsset]
  }

  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    Multimodal.decodeFeatures(s, sharedAssets(s, dir)).toDF()
      .select(col("asset_id"), col("mime"), col("n_bytes"), col("frames_sampled"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("feat_0"),
        col("decoded_width"), col("decoded_height"), col("sample_rate"),
        col("decoded_duration_ms"), col("pcm_mean_abs"), col("parse_ok"))
      .orderBy("asset_id")
  }

  private def mmResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeImages(s, sharedAssets(s, dir), 8, 8)
      .drop("pixels")
      .orderBy("asset_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgram _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_substring_strip" -> (dedupSubstringStrip _),
    "dedup_minhash_lsh" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    // 0-row INVARIANT (rows = LSH/exact disagreements); non-trivial because
    // dedup_minhash_lsh + dedup_ngram_jaccard (25 pairs each) prove both
    // sides are non-empty
    "dedup_lsh_vs_exact" -> (dedupLshVsExact _),
    "dedup_clusters" -> (dedupClusters _),
    "sample_split" -> (sampleSplit _),
    "text_vocab" -> (textVocab _),
    "text_repetition" -> (textRepetition _),
    "text_bigrams" -> (textBigrams _),
    "text_common_ratio" -> (textCommonRatio _),
    "pack_sequences" -> (packSequences _),
    "pipeline_curate" -> (curatedDocs _),
    "pipeline_curate_pack" -> (pipelineCuratePack _),
    "corpus_report" -> (corpusReport _),
    "decontaminate" -> (decontaminate _),
    "dedup_stream" -> (dedupStream _),
    "ann_brute_topk" -> (annBrute _),
    "ann_lsh_topk" -> (annLsh _),
    // 0-row INVARIANT (rows = ground-truth neighbors the index missed);
    // non-trivial because ann_lsh_topk (50 rows) proves the index answers
    "ann_lsh_recall" -> (annLshRecall _),
    "ann_ivf_topk" -> (annIvf _),
    // 0-row INVARIANT, companion ann_ivf_topk (50 rows) — as lsh_recall
    "ann_ivf_recall" -> (annIvfRecall _),
    "dedup_embedding" -> (dedupEmbedding _),
    "text_stats" -> (textStats _),
    "text_tokens_bpe" -> (textTokensBpe _),
    "text_langid" -> (textLangId _),
    "text_fingerprint" -> (textFingerprint _),
    "mm_features" -> (mmFeatures _),
    "mm_resize" -> (mmResize _)
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> """
      SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY text ORDER BY doc_id""",
    "dedup_ngram_jaccard" ->
      Dedup.duckDbNgramJaccardSql("documents", 3, 0.5, 100, "doc_id", "text"),
    "dedup_substring" ->
      Dedup.duckDbDupSpansSql("documents", 5, 2, "doc_id", "text"),
    "dedup_substring_strip" ->
      Dedup.duckDbStripSpansSql("documents", 5, 2, "doc_id", "text"),
    "dedup_clusters" ->
      Dedup.duckDbClustersSql("documents", 3, 0.5, 100, "doc_id", "text"),
    "sample_split" -> s"""
      SELECT doc_id,
             ${TextAnalysis.duckDbLangIdSql("text")} AS stratum,
             ${Sampling.duckDbSplitSql("doc_id")} AS split,
             ${Sampling.duckDbStratifiedKeepSql("doc_id",
                 TextAnalysis.duckDbLangIdSql("text"), StratumRates, 100)} AS sampled
      FROM documents ORDER BY doc_id""",
    "text_vocab" ->
      TextAnalysis.duckDbVocabularySql("documents", 100, "doc_id", "text"),
    "text_repetition" -> s"""
      SELECT doc_id, ${TextAnalysis.duckDbDupNgramFracSql("text", 3)} AS dup_3gram_frac
      FROM documents ORDER BY doc_id""",
    "text_bigrams" ->
      TextAnalysis.duckDbBigramPairsSql("documents", 50, "doc_id", "text"),
    "text_common_ratio" ->
      TextAnalysis.duckDbCommonTokenBpSql("documents", 100, "doc_id", "text"),
    "pack_sequences" ->
      Packing.duckDbConcatChunkPackSql("documents", 2048, "doc_id", "text"),
    "pipeline_curate" -> s"""
      SELECT doc_id,
             ${TextAnalysis.duckDbLangIdSql("text")} AS lang_pred,
             ${TextAnalysis.duckDbQualitySql("text")} AS quality,
             ${TextAnalysis.duckDbDupNgramFracSql("text", 3)} AS repetition,
             ${Sampling.duckDbSplitSql("doc_id")} AS split
      FROM documents
      WHERE $curateWhereSql
      ORDER BY doc_id""",
    "pipeline_curate_pack" ->
      Packing.duckDbConcatChunkPackSql(
        s"(SELECT * FROM documents WHERE $curateWhereSql) AS curated",
        2048, "doc_id", "text"),
    "corpus_report" ->
      (TextAnalysis.duckDbCorpusReportSql("documents", "lang", "source", "text")
        + " ORDER BY lang, source"),
    "decontaminate" ->
      Dedup.duckDbContaminationSql("documents", "source <> 'src0'",
        "source = 'src0'", 8, "doc_id", "text"),
    "dedup_stream" -> """
      SELECT DISTINCT md5(text) AS text_md5 FROM documents ORDER BY text_md5""",
    // every resized pixel re-derived from the hex-dumped container bytes:
    // content sits at a fixed offset in the SYNTHESIZED PNGs (sig 8 + IHDR
    // chunk 25 + IDAT len/tag 8 = 41; total container overhead 57), pixel
    // accessor and nearest-neighbor index math mirror Multimodal.resizeImages
    "mm_resize" -> """
      WITH a AS (
        SELECT asset_id, width AS sw, height AS sh
        FROM read_parquet('__VOUT__/_aux/mm_assets/*.parquet')
        WHERE mime = 'image/png'),
      p AS (SELECT asset_id, hex(raw) AS hx
            FROM read_parquet('__VOUT__/_aux/mm_pixels/*.parquet')
            WHERE octet_length(raw) > 0),
      px AS (
        SELECT a.asset_id, a.sw, a.sh,
               list_transform(range(64), i ->
                 ('0x' || substr(p.hx,
                    2 * ((((i // 8) * a.sh // 8) * a.sw + ((i % 8) * a.sw // 8)) * 3) + 1,
                    2))::INT) AS b
        FROM a JOIN p USING (asset_id))
      SELECT asset_id, sw AS src_w, sh AS src_h, 8 AS dst_w, 8 AS dst_h,
             list_sum(b)::BIGINT AS byte_sum, b[1] AS first_px, b[64] AS last_px
      FROM px ORDER BY asset_id""",
    // soundness invariants: the Spark side must produce ZERO rows
    "dedup_lsh_vs_exact" -> """
      SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b WHERE 1 = 0""",
    "ann_lsh_recall" -> """
      SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS n_hits
      WHERE 1 = 0""",
    "ann_ivf_recall" -> """
      SELECT CAST(NULL AS BIGINT) AS total_hits WHERE 1 = 0""",
    "ann_ivf_topk" ->
      Similarity.duckDbIvfTopKSql("embeddings", QueryIds, 10, 4, "vec_id", "embedding"),
    "dedup_embedding" ->
      Similarity.duckDbCosineNearDupSql("embeddings", 0.4, 12, "vec_id", "embedding"),
    "ann_brute_topk" ->
      Similarity.duckDbBruteForceSql("embeddings", QueryIds, 10, "vec_id", "embedding"),
    "text_stats" -> s"""
      SELECT doc_id,
             len(${TextAnalysis.duckDbTokensSql("text")}) AS n_tokens,
             ROUND(length(regexp_replace(trim(text), '\\s', '', 'g')) * 1.0
               / greatest(len(${TextAnalysis.duckDbTokensSql("text")}), 1), 4) AS avg_token_len,
             ROUND((length(text) - length(regexp_replace(text, '[,.!?;:]', '', 'g'))) * 1.0
               / greatest(length(text), 1), 4) AS punct_ratio,
             ${TextAnalysis.duckDbQualitySql("text")} AS quality
      FROM documents ORDER BY doc_id""",
    "text_tokens_bpe" -> """
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
      FROM documents ORDER BY doc_id""",
    "text_langid" -> s"""
      SELECT doc_id, ${TextAnalysis.duckDbLangIdSql("text")} AS lang_pred
      FROM documents ORDER BY doc_id""",
    "text_fingerprint" ->
      RollingFingerprint.duckDbSql("documents", "doc_id", "text", 16),
    "dedup_minhash_lsh" ->
      Dedup.duckDbMinhashLshSql(numHashes = 32, bands = 8, threshold = 0.5),
    "dedup_simhash" -> Dedup.duckDbSimhashSql(maxHamming = 3),
    "ann_lsh_topk" ->
      Similarity.duckDbLshTopKSql("embeddings", QueryIds, 10, "vec_id", "embedding"),
    // the decode must reproduce the encode-time declarations (see mm_truth)
    "mm_features" -> """
      SELECT asset_id, mime, n_bytes, frames_sampled, feat_0,
             decoded_width, decoded_height, sample_rate, decoded_duration_ms,
             pcm_mean_abs, parse_ok
      FROM read_parquet('__VOUT__/_aux/mm_truth/*.parquet')
      ORDER BY asset_id"""
  )
}
