package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.when
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingFingerprint

class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 40 base docs + planted near-duplicates (one word changed) + exact dups. */
  lazy val docs = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "query", "join", "filter", "scan", "merge",
      "sort", "hash", "row", "batch", "curve", "delay", "stop", "route",
      "window", "table", "group", "value", "data", "key")
    val base = (0L until 40L).map { i =>
      val words = Seq.fill(30)(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val nearDups = base.take(5).map { case (i, t) =>
      val words = t.split(" ")
      words(10) = "CHANGED"
      (i + 100, words.mkString(" "))
    }
    val exactDups = base.slice(5, 8).map { case (i, t) => (i + 200, t) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup groups exact duplicates only") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 45, "48 docs - 3 exact dups = 45 groups")
    assert(out.count(_.getLong(1) == 2) == 3)
  }

  test("ngram jaccard finds planted near-dups with high similarity") {
    val pairs = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // exact dups → jaccard 1.0
    for (i <- 5L until 8L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 200 && p._3 == 1.0),
        s"exact pair $i missing")
    // near dups (1 word of 30 changed → 3 of ~28 shingles differ per side)
    for (i <- 0L until 5L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 100 && p._3 > 0.6),
        s"near pair $i missing")
  }

  test("substring dedup: hand-computed spans, within-doc repeats, merge rule") {
    val d = Seq(
      (1L, "a b c d e f g h"),          // shares a b c d e f with doc 2
      (2L, "x x a b c d e f y"),
      (3L, "p q r s p q r s"),          // within-doc repeat of p q r / q r s
      (4L, "unique words only here now") // no duplicated 3-gram anywhere
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(d, n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: dup windows at 0..3 (abc bcd cde def) -> tokens [0, 5]
    // doc 2: the same four windows at 2..5 -> tokens [2, 7]
    // doc 3: pqr@{0,4}, qrs@{1,5}; 4 <= 1+3 merges -> one span [0, 7]
    assert(spans == Set((1L, 0L, 5L), (2L, 2L, 7L), (3L, 0L, 7L)))
    // invariant: spans per doc are disjoint with at least one uncovered
    // token between them, and lie within the doc's token bounds
    val byDoc = Dedup.dupSpans(docs, n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byDoc.values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, s, e) => assert(s >= 0 && e >= s) }
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1 + 1,
          "adjacent duplicated regions must have merged into one span")
        case _ =>
      }
    }
    // exact duplicate docs produce a whole-doc span on both copies
    val pair = Seq((10L, "one two three four five six seven"),
      (11L, "one two three four five six seven")).toDF("doc_id", "text")
    val whole = Dedup.dupSpans(pair, n = 3, minCount = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(whole == Set((10L, 0L, 6L), (11L, 0L, 6L)))
  }

  test("substring strip removes exactly the span tokens, passes clean docs through") {
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x a b c d e f y"),
      (3L, "unique words only here now")).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(d, n = 3, minCount = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // doc 1 loses tokens [0,5] (span), doc 2 loses [2,7], doc 3 untouched
    assert(out == Set(
      (1L, "g h", 6L),
      (2L, "x x y", 6L),
      (3L, "unique words only here now", 0L)))
    // a fully-duplicated doc comes out empty, not dropped; a NULL text
    // tokenizes as empty (the oracle's COALESCE convention), never NULL out
    val pair = Seq((10L, "one two three"), (11L, "one two three"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val whole = Dedup.stripDupSpans(pair, n = 3, minCount = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(whole == Set((10L, "", 3L), (11L, "", 3L), (12L, "", 0L)))
  }

  test("minhash LSH recovers the same >=0.5 pairs as exact jaccard") {
    val exact = Dedup.ngramJaccard(docs, 3, 0.5, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 3, 32, 8, 0.5, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH verifies candidates exactly → no false positives
    assert(lsh.subsetOf(exact))
    // recall on this tiny planted set should be total
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  test("simhash: exact dups at distance 0, planted near-dups found") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (i <- 5L until 8L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 200 && p._3 == 0),
        s"exact pair $i not at hamming 0")
    assert(pairs.exists(p => p._2 - p._1 == 100), "some near-dup found")
  }

  test("brute-force ANN is exact; LSH ANN has decent recall on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L)
    val brute = Similarity.bruteForceTopK(emb, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.size == 30)
    val lsh = Similarity.lshTopK(emb, qids, 10, numTables = 8, planesPerTable = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 8 tables × 4 planes: per-table match prob q=(1-θ/π)^4, union recall
    // 1-(1-q)^8. Require ≥50% on the true top-10 (sanity, not tuned).
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("ANN dim validation: the debug conf catches deep heterogeneous vector lengths") {
    import spark.implicits._
    // first row matches dim → the cheap fail-fast probe passes; row 7 is
    // shorter and would silently prefix-bucket
    val emb = (0L until 10L).map(i =>
      (i, Array.fill(if (i == 7) 3 else 4)(0.1f * (i + 1))))
      .toDF("vec_id", "embedding")
    Similarity.lshTopK(emb, Seq(0L), 3, numTables = 2, planesPerTable = 3,
      dim = 4).collect() // default: no full scan, no error
    spark.conf.set("spark.graft.ann.validateDims", "true")
    try {
      val e = intercept[IllegalArgumentException](
        Similarity.lshTopK(emb, Seq(0L), 3, numTables = 2, planesPerTable = 3,
          dim = 4))
      assert(e.getMessage.contains("validateDims"))
    } finally spark.conf.unset("spark.graft.ann.validateDims")
  }

  test("cosine near-dup pairs: auto-sized planes, identical vectors always found") {
    // the sizing rule keeps expected bucket occupancy n/2^k near the target,
    // so candidate volume stays linear in n instead of collapsing to
    // all-pairs as a fixed k would
    assert(Similarity.autoPlanesPerTable(100) == 4)       // floor
    assert(Similarity.autoPlanesPerTable(2000) == 7)      // ceil(log2(2000/16))
    assert(Similarity.autoPlanesPerTable(1L << 40) == 36) // grows with log2 n
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant exact duplicates (cosine 1.0): same signature in EVERY table, so
    // they survive any auto-sized bucketing
    val planted = emb.limit(3).select(
      (org.apache.spark.sql.functions.col("vec_id") + 100000L).as("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val pairs = Similarity.cosineNearDupPairs(emb.union(planted), threshold = 0.99)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = emb.limit(3).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet
    assert(expected.subsetOf(found), s"planted dups missed: ${expected -- found}")
    // precision is exact: every reported pair really clears the threshold
    assert(pairs.forall(_.getDouble(2) >= 0.99))
  }

  test("zero-norm and null-element vectors: cosine 0, not NaN rank-1; dot treats null as 0") {
    import org.apache.spark.sql.functions.col
    // a zero vector's cosine is 0/0 = NaN without the guard — and Spark
    // sorts NaN ABOVE every real cosine, making it everyone's best match
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.3f)),
      (99L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, Seq(0L), k = 3).collect()
    assert(top.head.getLong(2) != 99L, "zero vector must not rank first")
    assert(top.forall(r => !r.getDouble(3).isNaN))
    assert(top.find(_.getLong(2) == 99L).forall(_.getDouble(3) == 0.0))
    // NaN >= threshold evaluates true in Spark: without the guard the zero
    // vector pairs with EVERYTHING above any threshold. dim must match the
    // data now — a mismatch fails fast instead of silently bucketing on a
    // truncated prefix
    intercept[IllegalArgumentException](
      Similarity.cosineNearDupPairs(vecs, threshold = 0.9))
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9, dim = 2).collect()
    assert(pairs.forall(r => r.getLong(0) != 99L && r.getLong(1) != 99L))
    // kMeans fit survives a zero vector (col/nrm would be NaN in the mean)
    val cents = Similarity.kMeansCentroids(vecs, nCells = 2, iters = 2, dim = 2)
    assert(cents.forall(_.forall(v => !v.isNaN)))
    // a null ELEMENT counts as 0.0 on every execution path (the unsafe-row
    // bulk copy already reads null slots as 0; the generic path must agree)
    val withNull = Seq((0L, Seq[java.lang.Float](1.0f, null, 2.0f)),
      (1L, Seq[java.lang.Float](3.0f, 4.0f, 5.0f))).toDF("id", "v")
    val d = withNull.groupBy().agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("id") === 0L,
            Similarity.dotCol(col("v"), col("v")))).as("s"))
      .collect().head.getDouble(0)
    assert(d == 5.0, s"1*1 + 0*0 + 2*2 = 5, got $d")
  }

  test("IVF ANN: deterministic fit, decent recall, candidates only from probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L)
    val c1 = Similarity.kMeansCentroids(emb, nCells = 8, iters = 3, dim = 64)
    val c2 = Similarity.kMeansCentroids(emb, nCells = 8, iters = 3, dim = 64)
    assert(c1.flatten.toSeq == c2.flatten.toSeq, "k-means fit not deterministic")
    val brute = Similarity.bruteForceTopK(emb, qids, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, qids, 10, nCells = 8, nProbe = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // approximate contract: IVF results are a subset of exactly re-scored
    // candidates, so every returned cosine equals the brute-force cosine
    val bruteCos = Similarity.bruteForceTopK(emb, qids, 200).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    Similarity.ivfTopK(emb, qids, 10, nCells = 8, nProbe = 3, iters = 3).collect()
      .foreach { r =>
        val key = (r.getLong(0), r.getLong(2))
        bruteCos.get(key).foreach(c => assert(c == r.getDouble(3),
          s"IVF cosine for $key differs from exact"))
      }
  }

  test("HyperplaneSignatures expression equals the Column-composed signatures") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val planes = (0 until 4).map(t =>
      Similarity.hyperplanes(64, 4, seed = 42L + t)).toArray
    val viaExpr = emb.select(col("vec_id"),
      graft.functions.HyperplaneSignatures(col("embedding"), planes).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = emb.select(col("vec_id") +:
      planes.zipWithIndex.map { case (p, t) =>
        Similarity.signatureCol(col("embedding"), p).as(s"s$t") }: _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaExpr.keySet == composed.keySet)
    viaExpr.foreach { case (id, sigs) =>
      assert(sigs == composed(id), s"signature mismatch for vec $id") }
  }

  test("NearestCentroid expression equals a driver-side recompute") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val cents = Similarity.kMeansCentroids(emb, nCells = 4, iters = 1, dim = 64)
    val viaExpr = emb.select(col("vec_id"),
      graft.functions.NearestCentroid(col("embedding"), cents, normalize = true)
        .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    emb.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val vd = graft.functions.HyperplaneSignatures.widen(v)
      val expect = graft.functions.NearestCentroid.assign(vd, cents, normalize = true)
      assert(viaExpr(r.getLong(0)) == expect)
    }
  }

  test("rolling fingerprint: equal texts equal, k-gram containment collides") {
    val fp = RollingFingerprint.fingerprint _
    assert(fp("hello world example", 8) == fp("hello world example", 8))
    assert(fp("abc", 8) == fp("abc", 8))
    assert(fp("", 8) == 0L)
    // a string containing the other's minimal window can share the fingerprint
    val a = "the quick brown fox jumps"
    val b = "PREFIX " + a + " SUFFIX"
    // not guaranteed equal, but the min-window of a must appear among b's hashes
    assert(fp(a, 4) >= 0L && fp(b, 4) >= 0L)
    // expression form works in a query
    val out = docs.select(RollingFingerprint(org.apache.spark.sql.functions.col("text"), 16))
      .collect()
    assert(out.length == 48 && out.forall(!_.isNullAt(0)))
    // exact dup docs share fingerprints
    val withFp = docs.select($"doc_id", RollingFingerprint($"text", 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 5L until 8L) assert(withFp(i) == withFp(i + 200))
  }

  test("ShingleHashes equals the transform/slice/xxhash64 composition") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      val nTok = rnd.nextInt(10) // includes docs shorter than the window
      (i.toLong, Seq.fill(nTok)(s"w${rnd.nextInt(30)}").mkString(" "))
    } :+ (999L, "")
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokensCol($"text").as("t"))
    for (n <- Seq(1, 3, 5)) {
      val composed = df.select($"doc_id", when(size($"t") >= n,
          transform(sequence(lit(0), size($"t") - n),
            i => xxhash64(slice($"t", i + 1, lit(n)))))
          .otherwise(array().cast("array<bigint>")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val native = df.select($"doc_id",
          graft.functions.ShingleHashes($"t", n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native == composed, s"n=$n")
    }
  }

  test("clusters match brute-force union-find over the same pair graph") {
    val pairs = Dedup.ngramJaccard(docs, 3, 0.5, 100)
    val collected = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    collected.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup.clusters(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("clusters propagate across multi-hop chains") {
    // 1-2-3-4-5 is a 4-hop chain (diameter > 1 forces real iteration);
    // 10-11 a separate component; 20 a singleton
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val corpus = (Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L)).toDF("doc_id")
    val out = Dedup.clusters(corpus, chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L))
    assert(out.filter(_._2 == 1L).forall(_._3 == 5L), "chain cluster size 5")
    assert(out.count(_._4) == 3, "one kept representative per cluster")
  }

  test("clusters converge on a chain far longer than maxIters (path halving)") {
    // a 200-node path has diameter 199 — one-hop-per-round propagation
    // would exhaust maxIters = 25 and (before round 5) silently return
    // unconverged labels; pointer doubling needs only ~log2(200) rounds
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val corpus = (0L until 200L).toDF("doc_id")
    val out = Dedup.clusters(corpus, chain).collect()
    assert(out.forall(_.getLong(1) == 0L), "whole chain labels to node 0")
    assert(out.count(_.getBoolean(3)) == 1, "exactly one kept exemplar")
  }

  test("clusters pin their self-sized shuffle width in the PLAN — the session conf never moves") {
    // SCALE.md r15: at 133M nodes the halving join OOMed on the session
    // default of 32 partitions and completed at 128. ADVICE r15: the first
    // fix bumped the session-global spark.sql.shuffle.partitions and
    // restored it in a finally — a concurrent query on the same
    // SparkSession could observe the bumped width mid-run or have its
    // width restored out from under it. The sizing now lives in the plan
    // as explicit repartition(n, key) nodes. Forced here with a tiny
    // rowsPerPartition: 6 pair-nodes / 1 per partition = 6 > the session 4.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val corpus = (1L to 6L).toDF("doc_id")
    // watch the conf from a CONCURRENT thread for the whole run: the old
    // set-and-restore would trip this observer; plan-pinned widths cannot
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val observer = new Thread(() => {
      while (!stop.get()) {
        observed.add(spark.conf.get("spark.sql.shuffle.partitions"))
        Thread.sleep(1)
      }
    })
    observer.start()
    val out =
      try Dedup.clusters(corpus, chain, rowsPerPartition = 1L).collect()
      finally { stop.set(true); observer.join(5000) }
    assert(out.forall(_.getLong(1) == 1L), "correctness unchanged by the sizing")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    import scala.jdk.CollectionConverters._
    assert(observed.asScala.forall(_ == before),
      s"a concurrent same-session query never sees a bumped width; saw: ${
        observed.asScala.toSet}")
    // the sizing is real, not dropped: the result's physical plan carries
    // the pinned 6-partition repartition on the cluster_id shuffle
    val plan = Dedup.clusters(corpus, chain, rowsPerPartition = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(cluster_id") && plan.contains(" 6)"),
      s"pinned width in the plan:\n$plan")
    // the throw path needs no restore bookkeeping anymore — but still throws
    intercept[IllegalStateException](
      Dedup.clusters(corpus, chain, maxIters = 1, rowsPerPartition = 1L))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("simhash banding finds every pair up to the Hamming-3 guarantee") {
    // signatures of a doc and its 3-bit-flipped copy differ in exactly 3
    // bits only if the flipped tokens flip 3 independent signature bits —
    // instead, verify the guarantee directly on the planted corpus: every
    // all-pairs Hamming <= 3 pair of signatures must appear in the banded
    // candidate output (the DuckDB oracle re-checks this at sf0.01; this
    // pins it in-process on the planted near-dup corpus)
    val sigs = Dedup.simhashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "planted corpus must contain Hamming<=3 pairs")
    assert(got == want, s"banding recall mismatch: missing ${want -- got}, extra ${got -- want}")
  }

  test("clusters equal union-find on random graphs (seeded property sweep)") {
    // long chains, cliques, stars, isolated nodes — all shapes in one sweep
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(1000 + seed)
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(nNodes)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(v: Long): Long = {
        val p = parent.getOrElse(v, v)
        if (p == v) v else { val r = find(p); parent(v) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0L until nNodes).map(v => v -> find(v)).toMap
      val corpus = (0L until nNodes).toDF("doc_id")
      val pairDf = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
                   else edges.toDF("a", "b")
      val got = Dedup.clusters(corpus, pairDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed: nodes=$nNodes edges=${edges.length}")
    }
  }

  test("sampling: deterministic splits and stratified keep rates") {
    val n = 10000L
    val ids = spark.range(n).withColumnRenamed("id", "doc_id")
    val splits = Sampling.assign(ids, when($"doc_id" % 3 === 0, "en").otherwise("other"),
      Map("en" -> 40), defaultPct = 100)
    val rows = splits.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    // deterministic: second evaluation identical
    val again = splits.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows.sameElements(again))
    // split shares near 80/10/10 (hash quality, not exact)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(math.abs(bySplit("train") - 8000) < 300, s"train=${bySplit("train")}")
    assert(math.abs(bySplit("valid") - 1000) < 150, s"valid=${bySplit("valid")}")
    assert(math.abs(bySplit("test") - 1000) < 150, s"test=${bySplit("test")}")
    // stratified keep: ~40% of en, 100% of everything else
    val en = rows.filter(_._2 == "en")
    val keptEn = en.count(_._4)
    assert(math.abs(keptEn.toDouble / en.length - 0.4) < 0.05)
    assert(rows.filter(_._2 == "other").forall(_._4), "default stratum keeps all")
    // keep decision independent of the split channel (salted hash): kept
    // fraction inside train ≈ kept fraction overall
    val enTrain = en.filter(_._3 == "train")
    assert(math.abs(enTrain.count(_._4).toDouble / enTrain.length -
      keptEn.toDouble / en.length) < 0.06)
    // huge ids: no ANSI overflow, bucket in range, high bits still matter
    val big = Seq(Long.MaxValue, Long.MaxValue - 1, 1L << 62, (1L << 40) + 7)
      .toDF("doc_id")
    val bb = big.select(Sampling.bucketCol($"doc_id", 100).as("b"),
        Sampling.bucketCol($"doc_id", 100, salt = 7919).as("bs")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(bb.forall(b => b >= 0 && b < 100))
    val lowSame = Seq(5L, 5L + (1L << 45)).toDF("doc_id")
      .select(Sampling.bucketCol($"doc_id", 1000000).as("b")).collect()
      .map(_.getLong(0))
    assert(lowSame(0) != lowSame(1), "ids differing only in high bits split")
  }

  test("sequence packing: serial recompute parity, partition-count independence") {
    // token counts: doc i has (i % 7) + 1 tokens
    val corpus = (0L until 300L)
      .map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 10L
    // serial reference
    var cum = 0L
    val expected = (0L until 300L).map { i =>
      val n = (i % 7) + 1
      val bin = cum / budget
      val strad = bin != (cum + n - 1) / budget
      cum += n
      (i, n, bin, strad)
    }
    def run(p: Int) = Packing.concatChunkPack(corpus, budget, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(run(1) == expected, "single-partition matches serial recompute")
    assert(run(7) == expected, "multi-partition prefix sum is identical")
    // bins respect the budget: total tokens mapped into a bin never exceed
    // budget except through a single straddling doc
    val byBin = expected.groupBy(_._3)
    byBin.foreach { case (_, ds) =>
      val nonStrad = ds.filter(!_._4).map(_._2).sum
      assert(nonStrad <= budget, "non-straddling tokens fit the budget")
    }
  }

  test("MarkerCounts equals the filter/isInCollection composition") {
    import org.apache.spark.sql.functions._
    val markers = TextAnalysis.LangMarkers.map(_._2)
    val rnd = new scala.util.Random(5)
    val pool = markers.flatten ++ Seq("zzz", "qqq", "na", "")
    val rows = (0 until 80).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20))(pool(rnd.nextInt(pool.size))).mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokensCol($"text").as("t"))
    val composed = df.select($"doc_id", array(markers.map(words =>
        size(filter($"t", tok => tok.isInCollection(words)))): _*).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val native = df.select($"doc_id",
        graft.functions.MarkerCounts($"t", markers).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == composed)
  }

  test("bigram pairs and common-token ratio on a tiny corpus") {
    val tiny = Seq((1L, "a b a"), (2L, "a c"), (3L, "b a z")).toDF("doc_id", "text")
    val bg = TextAnalysis.bigramPairs(tiny, topN = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (a,b)=1 (b,a)=2 (a,c)=1 (a,z)=1 -> top3: (b,a,2),(a,b,1),(a,c,1)
    assert(bg.toSeq == Seq(("b", "a", 2L), ("a", "b", 1L), ("a", "c", 1L)))
    // top-2 vocab = a(4,3), b(2,2); doc 3 has 1 of 3 tokens outside it
    val cr = TextAnalysis.commonTokenBpCol(tiny, vocabN = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cr == Map(1L -> 10000L, 2L -> 5000L, 3L -> 6666L))
  }

  test("repetition: duplicated-ngram fraction on constructed docs") {
    import org.apache.spark.sql.functions.col
    val tiny = Seq(
      (1L, "a b a b a b"),       // 4 trigrams, 2 distinct -> 0.5
      (2L, "w x y z"),           // 2 trigrams, both distinct -> 0.0
      (3L, "a b"),               // < 3 tokens -> 0.0
      (4L, "r r r r r")          // 3 trigrams, 1 distinct -> floor(2/3) = 0.6666
    ).toDF("doc_id", "text")
    val out = tiny.select(col("doc_id"),
        TextAnalysis.dupNgramFracCol(col("text"), 3).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.0, 3L -> 0.0, 4L -> 0.6666))
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no overlap at all here now"),
      (3L, "something quick brown fox jumps over the lazy dog variant")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "xx quick brown fox jumps over the lazy dog yy"))
      .toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 share the 8-gram "quick brown fox jumps over the lazy dog"
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) >= 1 && out(3L) >= 1)
  }

  test("corpus report aggregates per stratum") {
    val withMeta = docs
      .withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("de"))
      .withColumn("source", when($"doc_id" < 40, "web").otherwise("planted"))
    val rep = TextAnalysis.corpusReport(withMeta).collect()
    assert(rep.map(_.getLong(2)).sum == 48, "every doc counted once")
    rep.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1, "quality in [0,1]")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1, "repetition in [0,1]")
    }
  }

  test("vocabulary: counts and deterministic top-N on a tiny corpus") {
    val tiny = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(tiny, topN = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 2L)),
      "tf desc then token asc; df = distinct docs")
  }

  test("curation chain: survivors pass every stage, drops have a reason") {
    import org.apache.spark.sql.functions._
    // stage the corpus with metadata the chain reads
    val corpus = docs
      .withColumn("lang", lit("en"))
      .withColumn("source",
        when($"doc_id" % 11 === 0, "bench").otherwise("web"))
    val pairs = Dedup.ngramJaccard(corpus, 3, 0.5, 100)
    val kept = Dedup.clusters(corpus, pairs).filter($"is_kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = Dedup.contamination(
      corpus.filter($"source" =!= "bench"),
      corpus.filter($"source" === "bench"), n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gates = corpus.select($"doc_id", $"source",
        TextAnalysis.langIdCol($"text").as("lang_pred"),
        TextAnalysis.qualityScoreCol($"text").as("q"),
        TextAnalysis.dupNgramFracCol($"text", 3).as("rep"),
        Sampling.stratifiedKeepCol($"doc_id", lit("en"), Map("en" -> 70), 100)
          .as("sampled"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // the composed chain, mirroring pipeline_curate's stages
    val survivors = corpus
      .withColumn("lang_pred", TextAnalysis.langIdCol($"text"))
      .filter(TextAnalysis.qualityScoreCol($"text") >= 0.0)
      .filter(TextAnalysis.dupNgramFracCol($"text", 3) <= 0.9)
      .filter($"source" =!= "bench")
      .join(corpus.sparkSession.createDataFrame(
        kept.toSeq.map(Tuple1(_))).toDF("doc_id"), Seq("doc_id"), "left_semi")
      .join(corpus.sparkSession.createDataFrame(
        contaminated.toSeq.map(Tuple1(_))).toDF("doc_id"), Seq("doc_id"), "left_anti")
      .filter(Sampling.stratifiedKeepCol($"doc_id", lit("en"), Map("en" -> 70), 100))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty, "some docs survive")
    survivors.foreach { id =>
      val (src, _, q, rep, sampled) = gates(id)
      assert(src != "bench" && q >= 0.0 && rep <= 0.9 && sampled
        && kept(id) && !contaminated(id), s"survivor $id passes every stage")
    }
    // every dropped doc fails at least one stage
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    (all -- survivors).foreach { id =>
      val (src, _, q, rep, sampled) = gates(id)
      assert(src == "bench" || q < 0.0 || rep > 0.9 || !sampled
        || !kept(id) || contaminated(id), s"dropped $id has a reason")
    }
  }

  test("multimodal plumbing: binary payloads, fixed-shape features, frames") {
    val assets = Multimodal.synthesizeAssets(spark, docs)
    val feats = Multimodal.decodeFeatures(spark, assets).collect()
    assert(feats.length == 48)
    feats.foreach { f =>
      assert(f.feature.length == 16, "fixed-shape feature vector")
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3f, "histogram normalized")
      assert(f.n_bytes > 0)
    }
    val frames = Multimodal.sampleFrames(spark, assets, stride = 32, maxFrames = 16)
    val fr = frames.collect()
    assert(fr.length == 48)
    fr.foreach(r => assert(r.getAs[Seq[Int]]("frame_bytes").length <= 16))
    // mime metadata assignment is deterministic
    val mimes = Multimodal.synthesizeAssets(spark, docs).collect()
      .map(a => a.asset_id -> a.mime).toMap
    assert(mimes(0L) == "image/png" && mimes(1L) == "audio/wav" && mimes(2L) == "video/mp4")
  }

  test("png codec: multi-row image decodes identically through ImageIO") {
    // independent-decoder cross-check for the MULTI-ROW case (per-scanline
    // filter bytes): the JDK's ImageIO validates signature, CRCs, zlib and
    // filter semantics with a completely separate implementation
    val content = Array.tabulate(29)(i => (i * 53 + 11).toByte)
    val w = 6; val h = 4
    val png = MediaCodec.pngBytes(w, h, content)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val own = MediaCodec.pngPixels(png).get
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      val want = ((own(base) & 0xff) << 16) | ((own(base + 1) & 0xff) << 8) |
        (own(base + 2) & 0xff)
      assert((argb & 0xffffff) == want,
        s"pixel ($x,$y): ImageIO ${argb & 0xffffff} vs own decoder $want")
    }
  }

  test("png codec: real zlib round-trip, genuine CRCs, corrupt stream rejected") {
    def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val content = Array.tabulate(11)(i => (i * 37 + 5).toByte)
    val b = MediaCodec.pngBytes(5, 3, content)
    // pixel channels round-trip through deflate→inflate→filter-strip
    val px = MediaCodec.pngPixels(b).get
    assert(px.length == 5 * 3 * 3)
    assert(px.zipWithIndex.forall { case (v, k) => v == content(k % content.length) },
      "channel bytes cycle through the content")
    // every chunk carries a genuine CRC32 over tag ++ data
    var o = 8
    var checked = 0
    while (o + 8 <= b.length) {
      val len = be32(b, o)
      val c = new java.util.zip.CRC32
      c.update(b, o + 4, 4 + len)
      assert(be32(b, o + 8 + len) == c.getValue.toInt, s"CRC of chunk at $o")
      checked += 1
      o += 12 + len
    }
    assert(checked == 3, "IHDR + IDAT + IEND")
    // a flipped byte inside the zlib stream must be rejected, not mis-decoded
    val corrupt = b.clone()
    corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    assert(MediaCodec.pngPixels(corrupt).isEmpty
      || !MediaCodec.pngPixels(corrupt).get.sameElements(px))
    // and NO corruption anywhere may throw — a decode over untrusted blobs
    // returns None, never fails the task
    val rnd = new scala.util.Random(99)
    for (_ <- 0 until 50) {
      val c = b.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt().toByte
      MediaCodec.pngPixels(c)       // must not throw
      MediaCodec.parsePng(c)
      MediaCodec.pngIdat(c)
    }
    for (cut <- Seq(0, 7, 12, 33, b.length - 1))
      MediaCodec.pngPixels(b.take(cut)) // truncations must not throw
    // corrupt IHDR dimensions: a high bit in width/height must be size-gated
    // to None, not overflow into a NegativeArraySize/OOM allocation
    for (o <- Seq(16, 17, 20)) { // width hi/lo-ish, height hi bytes
      val big = b.clone()
      big(o) = 0x7f.toByte
      assert(MediaCodec.pngPixels(big).isEmpty, s"dim byte $o must gate")
    }
  }

  test("wav bytes parse identically through the JDK's independent audio stack") {
    // javax.sound.sampled is a separate RIFF/WAVE implementation: header
    // fields and the raw PCM payload must agree with MediaCodec's walker
    val samples = Array.tabulate(64)(i => (i * 7 - 3).toByte)
    val wav = MediaCodec.wavBytes(16000, 2, 16, samples)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2
      && fmt.getSampleSizeInBits == 16,
      s"JDK parsed $fmt vs encoder (16000 Hz, 2 ch, 16 bit)")
    val jdkPcm = ais.readAllBytes()
    val ownPcm = MediaCodec.wavData(wav).get
    assert(jdkPcm.sameElements(ownPcm),
      "PCM payload must be byte-identical through both parsers")
    assert(MediaCodec.parseWav(wav).exists { case (sr, ch, bits, _) =>
      sr == 16000 && ch == 2 && bits == 16 })
  }

  test("wav/mp4 walkers: corrupt chunk/box lengths never hang or throw") {
    val wav = MediaCodec.wavBytes(8000, 1, 16, Array.tabulate(32)(_.toByte))
    // negative RIFF chunk length (F8 FF FF FF) previously advanced the walk
    // by ZERO — an executor-hanging infinite loop; large positive lengths
    // overflowed the offset into negative indexing
    for (len <- Seq(Array[Byte](-8, -1, -1, -1), Array[Byte](-1, -1, -1, 0x7f))) {
      val c = wav.clone()
      System.arraycopy(len, 0, c, 16, 4) // the fmt chunk's length field
      MediaCodec.parseWav(c) // must terminate without throwing
      MediaCodec.wavData(c)
    }
    val mp4 = MediaCodec.mp4Bytes(1000, 5000, Array.tabulate(16)(_.toByte))
    // forged box size near 2^31: 'o + size' must not wrap past the bounds
    // check and walk off the buffer
    for (sz <- Seq(Array[Byte](0x7f, -1, -1, -8), Array[Byte](-1, -1, -1, -1))) {
      val c = mp4.clone()
      System.arraycopy(sz, 0, c, 16, 4) // the moov box's size field
      assert(MediaCodec.parseMp4(c).isEmpty)
    }
    // truncated version-1 mvhd must not read past the box
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 60) {
      val c = mp4.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt().toByte
      MediaCodec.parseMp4(c) // must not throw
      MediaCodec.parseWav(c)
    }
  }

  test("image resize: nearest-neighbor on a hand-computed asset; non-images skipped") {
    import spark.implicits._
    val content = Array[Byte](10, 20, 30, 40)
    val assets = Seq(
      MediaAsset(1L, "image/png", MediaCodec.pngBytes(4, 2, content),
        width = 4, height = 2, duration_ms = 0L),
      MediaAsset(2L, "audio/wav", MediaCodec.wavBytes(8000, 1, 16, content),
        width = 0, height = 0, duration_ms = 0L)).toDS()
    val out = Multimodal.resizeImages(spark, assets, 2, 2).collect()
    assert(out.length == 1, "only the image resizes")
    val r = out.head
    assert(r.getAs[Long]("asset_id") == 1L)
    // sy=y, sx=2x -> pixels (0,0)=c[0]=10 (0,1)=c[2]=30 (1,0)=c[0]=10 (1,1)=c[2]=30
    assert(r.getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](10, 30, 10, 30))
    assert(r.getAs[Long]("byte_sum") == 80L)
    assert(r.getAs[Int]("first_px") == 10 && r.getAs[Int]("last_px") == 30)
    // upsample: 1x1 source content byte fills the whole target
    val one = Seq(MediaAsset(3L, "image/png",
      MediaCodec.pngBytes(1, 1, Array[Byte](7)), 1, 1, 0L)).toDS()
    val up = Multimodal.resizeImages(spark, one, 4, 4).collect().head
    assert(up.getAs[Long]("byte_sum") == 7L * 16)
    // metadata drift: declared dims disagree with the actual header — the
    // resize must index by the DECODED dims (no out-of-bounds task failure)
    // and report them as the source size
    val drifted = Seq(MediaAsset(4L, "image/png",
      MediaCodec.pngBytes(4, 2, content), width = 64, height = 64, 0L)).toDS()
    val dr = Multimodal.resizeImages(spark, drifted, 2, 2).collect().head
    assert(dr.getAs[Int]("src_w") == 4 && dr.getAs[Int]("src_h") == 2)
    assert(dr.getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](10, 30, 10, 30))
    // RGBA (color type 6): the pixel stride is 4, so the red channel of
    // pixel (0, x) is byte 4x — a fixed 3-byte stride would read byte 3
    // (the previous pixel's alpha) for x=1. Discriminating values chosen so
    // the wrong stride yields a different pixel sequence.
    val rgbaContent = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val rgba = Seq(MediaAsset(5L, "image/png",
      MediaCodec.pngBytes(2, 1, rgbaContent, channels = 4), 2, 1, 0L)).toDS()
    val rr = Multimodal.resizeImages(spark, rgba, 2, 1).collect().head
    assert(rr.getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](1, 5),
      "RGBA resize samples the red channel at 4-byte stride")
  }

  test("media codecs: header parse round-trips the declared metadata") {
    val assets = Multimodal.synthesizeAssets(spark, docs).collect()
      .map(a => a.asset_id -> a).toMap
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.synthesizeAssets(spark, docs)).collect()
    assert(feats.forall(_.parse_ok), "every synthesized container parses")
    feats.foreach { f =>
      val a = assets(f.asset_id)
      f.mime match {
        case "image/png" =>
          assert(f.decoded_width == a.width && f.decoded_height == a.height,
            s"PNG IHDR round-trip for ${f.asset_id}")
        case "audio/wav" =>
          assert(f.sample_rate == 8000, "fmt chunk sample rate")
          assert(f.decoded_duration_ms == a.duration_ms, "data-chunk duration")
        case "video/mp4" =>
          assert(f.decoded_duration_ms == a.duration_ms, "mvhd duration")
      }
    }
    // direct codec checks, including a 64-bit-time mvhd and corrupt input
    assert(MediaCodec.parsePng(MediaCodec.pngBytes(640, 480, Array[Byte](1, 2)))
      .contains((640, 480, 8)))
    assert(MediaCodec.parseWav(MediaCodec.wavBytes(44100, 2, 16, new Array[Byte](44100 * 4)))
      .contains((44100, 2, 16, 1000L)))
    assert(MediaCodec.parseMp4(MediaCodec.mp4Bytes(600, 1200, Array[Byte](9)))
      .map(_._3).contains(2000L))
    assert(MediaCodec.parsePng("not a png".getBytes).isEmpty)
    assert(MediaCodec.parseWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(MediaCodec.parseMp4(new Array[Byte](6)).isEmpty)
    // corrupt payload flows through decode as parse_ok=false, not a crash
    import spark.implicits._
    val bad = Seq(MediaAsset(99L, "image/png", "garbage".getBytes, 1, 1, 0L)).toDS()
    val badFeat = Multimodal.decodeFeatures(spark, bad).collect().head
    assert(!badFeat.parse_ok && badFeat.decoded_width == -1)
  }

  test("corpusCount: footer metadata equals count() through projection layers") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_count").toString
    spark.range(12345).selectExpr("id as vec_id", "cast(id as string) as pad")
      .repartition(7).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    // bare scan, projection and alias layers are row-preserving -> footer path
    assert(Similarity.corpusCount(base) == 12345L)
    assert(Similarity.corpusCount(base.select("vec_id").as("t")) == 12345L)
    // a FILTER is not row-preserving: must fall back to a real count
    assert(Similarity.corpusCount(base.filter("vec_id < 100")) == 100L)
    // caller hint wins without touching the plan
    assert(Similarity.corpusCount(base, hint = 77L) == 77L)
    // non-file relation (in-memory) falls back to count()
    assert(Similarity.corpusCount(spark.range(9).toDF("vec_id")) == 9L)
  }

  test("corpusCount: many-file tables sample footers and extrapolate by bytes") {
    val dir = java.nio.file.Files.createTempDirectory("corpus_count_many").toString
    // 64 files of uneven row counts (range partitioning is contiguous)
    spark.range(20000).selectExpr("id as vec_id", "cast(id as string) as pad")
      .repartition(64).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles > 8, s"fixture must have many files, got $nFiles")
    // under the cap: exact
    assert(Similarity.corpusCount(base) == 20000L)
    // over the cap: strided sample + bytes extrapolation — sizing needs a
    // factor-of-~2 estimate, assert well inside that
    val est = Similarity.corpusCount(base, maxFooters = 8)
    assert(est > 10000L && est < 40000L, s"estimate $est out of range")
    // the estimate must feed the same auto plane count as the exact figure
    assert(Similarity.autoPlanesPerTable(est) == Similarity.autoPlanesPerTable(20000L))
  }
}
