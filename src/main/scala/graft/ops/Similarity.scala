package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products use the native [[graft.functions.DotProduct]] codegen
  * expression (higher-order `zip_with`+`aggregate` is interpreted, and this
  * is the candidate-scoring hot loop), summed left-to-right in DOUBLE so the
  * DuckDB oracle (list_dot_product over DOUBLE[]) produces bit-identical
  * values.
  *
  * Brute force is the correctness baseline (query-side broadcast, one pass
  * over the corpus — at 100 TB this is the right shape for SMALL query sets);
  * [[lshTopK]] is the scale path: random-hyperplane signatures bucket the
  * corpus so each query only scores its bucket.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float vectors. */
  // native codegen expression, NOT aggregate(zip_with(...)): higher-order
  // functions are always interpreted, and this is the per-candidate scoring
  // loop of every similarity op (same left-to-right Double accumulation, so
  // values — and the DuckDB oracles — are unchanged)
  def dotCol(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Cosine with the zero-norm guard: a zero vector (empty doc, failed
    * encoder row) has no direction — its similarity to anything is 0, NOT
    * the 0/0 = NaN that Spark's ordering would sort above every real
    * cosine (making the zero vector everyone's rank-1 "neighbor") and that
    * `NaN >= threshold` would wrongly pass. */
  def cosineCol(a: Column, b: Column): Column =
    safeCosine(dotCol(a, b), normCol(a) * normCol(b))

  private def safeCosine(dot: Column, normProduct: Column): Column =
    when(normProduct === 0d, lit(0.0)).otherwise(dot / normProduct)

  /** The same guard on the SQL side: x / NULLIF(np, 0) is NULL for a zero
    * norm, coalesced to 0 — DuckDB also sorts NaN above every number, so
    * both engines need the branch to agree. */
  private def safeCosineSql(dot: String, normProduct: String): String =
    s"COALESCE($dot / NULLIF($normProduct, 0), 0)"

  /** Exact top-k by cosine for the given query ids (self-excluded).
    * The query side is tiny → broadcast; the corpus is scanned once.
    * Norms are computed ONCE per side before the pair join (not per pair —
    * at 100 TB the corpus norm would otherwise be recomputed |queries|
    * times); `q_norm * m_norm` multiplies in the same order as
    * `normCol(q) * normCol(m)`, so the cosines are bit-identical. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = embeddings
      .filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        normCol(col(vecCol)).as("q_norm"))
    val corpus = embeddings.select(col(idCol).as("match_id"), col(vecCol).as("m_vec"),
      normCol(col(vecCol)).as("m_norm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id"))
    broadcast(queries).join(corpus, col("query_id") =!= col("match_id"))
      .withColumn("cosine",
        round(safeCosine(dotCol(col("q_vec"), col("m_vec")),
          col("q_norm") * col("m_norm")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("match_id"), col("cosine"))
  }

  /** DuckDB twin of [[bruteForceTopK]] (double casts keep the sums identical). */
  def duckDbBruteForceSql(table: String, queryIds: Seq[Long], k: Int,
                          idCol: String, vecCol: String): String = s"""
    WITH q AS (SELECT $idCol AS query_id, $vecCol::DOUBLE[] AS qv FROM $table
               WHERE $idCol IN (${queryIds.mkString(", ")})),
    c AS (SELECT $idCol AS match_id, $vecCol::DOUBLE[] AS mv FROM $table),
    scored AS (
      SELECT query_id, match_id,
             ROUND(${safeCosineSql("list_dot_product(qv, mv)",
               "sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(mv, mv))")}, 4) AS cosine
      FROM q JOIN c ON query_id <> match_id)
    SELECT query_id, rank, match_id, cosine FROM (
      SELECT query_id, match_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id) AS rank
      FROM scored)
    WHERE rank <= $k
    ORDER BY query_id, rank"""

  /** Deterministic random hyperplanes (seeded) for signature bucketing. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Fail fast when the embedding column's length disagrees with `dim`:
    * [[graft.functions.HyperplaneSignatures]] dots over min(vec, plane)
    * length, so a forgotten dim override would silently bucket on a PREFIX
    * of each vector and collapse LSH recall with no error. One 1-row probe
    * job; an empty or null-leading corpus passes (nothing to mis-bucket
    * that the scan itself won't surface). */
  private def requireDim(embeddings: DataFrame, vecCol: String, dim: Int): Unit = {
    embeddings.select(size(col(vecCol)).as("n")).take(1)
      .foreach { r =>
        if (!r.isNullAt(0))
          require(r.getInt(0) == dim,
            s"$vecCol length ${r.getInt(0)} != dim $dim — pass the actual dimension")
      }
    // the probe sees only the first non-null row; a corpus with
    // HETEROGENEOUS vector lengths deeper in still prefix-buckets
    // silently. Full validation costs one corpus pass, so it rides behind
    // a debug conf instead of taxing every production call.
    if (embeddings.sparkSession.conf
        .get("spark.graft.ann.validateDims", "false").toBoolean) {
      val bad = embeddings
        .filter(col(vecCol).isNotNull && size(col(vecCol)) =!= dim).count()
      require(bad == 0,
        s"$bad rows have $vecCol length != dim $dim (spark.graft.ann.validateDims)")
    }
  }

  /** Sign-bit signature of a vector against the hyperplanes, as a Column
    * (bit i set ⟺ dot(v, plane_i) > 0). NOT on any hot path — the
    * per-plane Column composition builds a huge expression tree (the
    * analysis/codegen pathology documented on
    * [[graft.functions.HyperplaneSignatures]], which supersedes it) — but
    * kept as the independent re-implementation the equivalence spec checks
    * the native expression against. */
  def signatureCol(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(plane.map(lit)): _*)
      when(dotCol(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** DuckDB oracle for [[lshTopK]] over `_aux/ann_planes` (the seeded
    * hyperplanes as DOUBLE[] rows): recomputes the sign-bit signatures with
    * list_dot_product (bit-identical to [[dotCol]]'s left-to-right double
    * sum), the per-table bucket join, candidate dedup and exact rescoring. */
  def duckDbLshTopKSql(table: String, queryIds: Seq[Long], k: Int,
                       idCol: String, vecCol: String): String = s"""
    WITH emb AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM $table),
    pl AS (SELECT tbl, plane_idx, plane FROM read_parquet('__VOUT__/_aux/ann_planes/*.parquet')),
    sigs AS (SELECT e.vid, p.tbl,
               SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                        THEN (1::BIGINT << p.plane_idx) ELSE 0 END) AS sig
             FROM emb e CROSS JOIN pl p GROUP BY e.vid, p.tbl),
    q AS (SELECT vid AS query_id, tbl, sig FROM sigs
          WHERE vid IN (${queryIds.mkString(", ")})),
    cand AS (SELECT DISTINCT q.query_id, s.vid AS match_id
             FROM q JOIN sigs s
               ON s.tbl = q.tbl AND s.sig = q.sig AND s.vid <> q.query_id),
    scored AS (SELECT c.query_id, c.match_id,
                 ROUND(${safeCosineSql("list_dot_product(qe.v, me.v)",
                   "sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(me.v, me.v))")}, 4) AS cosine
               FROM cand c
               JOIN emb qe ON qe.vid = c.query_id
               JOIN emb me ON me.vid = c.match_id)
    SELECT query_id, rank, match_id, cosine FROM (
      SELECT query_id, match_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, match_id) AS rank
      FROM scored)
    WHERE rank <= $k
    ORDER BY query_id, rank"""

  /** Corpus row count without running a scan JOB where possible: caller
    * hint first, else parquet footer metadata when the plan bottoms out in
    * a bare parquet scan (projection/alias layers are row-preserving), else
    * one `count()` as the last resort. The sizing decisions fed by this
    * (plane count, Lloyd fit sample) need n only to a factor of ~2, but the
    * footer sum is exact anyway — and at 100 TB it replaces a full corpus
    * pass per invocation with a driver walk over file metadata the
    * FileIndex already holds. */
  private[graft] def corpusCount(df: DataFrame, hint: Long = -1L,
                                 maxFooters: Int = 4096): Long = {
    if (hint > 0) return hint
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, child)       => strip(child)
      case SubqueryAlias(_, child) => strip(child)
      case other                   => other
    }
    strip(df.queryExecution.optimizedPlan) match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
            val conf = df.sparkSession.sessionState.newHadoopConf()
            // footer opens run on a bounded thread pool, not serially: a
            // large table has 10^5-10^6 files, and one blocking remote
            // round-trip per file from a single driver thread would take
            // minutes — 32-way concurrency keeps the walk metadata-cheap
            val statuses = fs.location.listFiles(Nil, Nil).flatMap(_.files)
            // bound the walk: past `maxFooters` files, open an evenly
            // strided SAMPLE of footers and extrapolate by bytes — sizing
            // needs n only to a factor of ~2, and opening 10^5-10^6 footers
            // would cost minutes of driver wall before the job starts
            val sample =
              if (statuses.length <= maxFooters) statuses
              else Seq.tabulate(maxFooters)(i =>
                statuses((i.toLong * statuses.length / maxFooters).toInt))
            val pool = java.util.concurrent.Executors.newFixedThreadPool(
              math.max(1, math.min(32, sample.length)))
            val sampledRows =
              try {
                import scala.jdk.CollectionConverters._
                val tasks = sample.map { st =>
                  new java.util.concurrent.Callable[Long] {
                    def call(): Long = {
                      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
                        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                          st.getPath, conf))
                      try r.getRecordCount finally r.close()
                    }
                  }
                }
                // unwrap ExecutionException: callers must see the original
                // parquet/IO error naming the failing file, not the pool's
                // wrapper
                pool.invokeAll(tasks.asJava).asScala.map { f =>
                  try f.get()
                  catch { case e: java.util.concurrent.ExecutionException =>
                    throw e.getCause }
                }.sum
              } finally pool.shutdown()
            if (sample.length == statuses.length) sampledRows
            else {
              val sampledBytes = math.max(1L, sample.map(_.getLen).sum)
              val totalBytes = statuses.map(_.getLen).sum
              math.round(sampledRows.toDouble * totalBytes / sampledBytes)
            }
          case _ => df.count()
        }
      case _ => df.count()
    }
  }

  /** Planes per table sized so the expected bucket occupancy n / 2^k stays
    * near `targetBucket` regardless of corpus size: candidate volume is then
    * ≈ numTables · n · targetBucket / 2 — LINEAR in n. A FIXED k degrades to
    * all-pairs as the corpus grows (at k=4 over 12 tables, random 64-dim
    * vectors collide somewhere with ~54 % probability — measured 1.08M of
    * the 2.0M possible pairs at n=2000), the same quadratic-candidate hazard
    * as an under-banded SimHash. Bucketing stays prefix-stable as k grows
    * because [[hyperplanes]] streams planes from one seeded RNG. */
  def autoPlanesPerTable(n: Long, targetBucket: Int = 16): Int =
    math.max(4, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** Embedding-cosine near-duplicate PAIRS (the dedup-flavoured use of the
    * ANN machinery): hyperplane-LSH buckets generate candidate pairs — a
    * bucket equi-SELF-join, shuffled on (table, signature) keys only, never
    * a cross join — and every candidate is exactly re-scored; pairs with
    * cosine ≥ `threshold` survive, `a < b` canonical. Recall follows the
    * multi-table union bound; precision is exact (candidates are verified).
    * `planesPerTable ≤ 0` (the default) auto-sizes via
    * [[autoPlanesPerTable]] from [[corpusCount]] — parquet footer metadata
    * (or the `corpusCountHint` param) rather than a `count()` scan, so
    * auto-sizing costs no extra corpus pass — and candidate volume stays
    * linear in the corpus.
    *
    * Shuffle discipline: vectors ride ONLY the input-volume bucket fan-out
    * (n × numTables rows); the cosine is computed map-side inside the join
    * stage and the threshold filter runs BEFORE any candidate-volume
    * exchange, so the pair-dedup shuffle carries surviving (a, b, cosine)
    * triples only. The earlier ids-only variant (dedup candidates, join
    * vectors back) re-attached two vectors per CANDIDATE — at 1M × 64-dim
    * that intermediate measured 13 GB shuffle + 43 GB spill for an 82M-pair
    * candidate set; this shape caps vector traffic at the corpus fan-out no
    * matter how hot the buckets run. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         numTables: Int = 12, planesPerTable: Int = 0,
                         dim: Int = 64, idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         corpusCountHint: Long = -1L): DataFrame = {
    requireDim(embeddings, vecCol, dim)
    val k = if (planesPerTable > 0) planesPerTable
            else autoPlanesPerTable(corpusCount(embeddings, corpusCountHint))
    val planes: Array[Array[Array[Double]]] =
      (0 until numTables).map(t => hyperplanes(dim, k, seed = 42L + t)).toArray
    val signed = embeddings
      .select(col(idCol), col(vecCol), normCol(col(vecCol)).as("nrm"),
        posexplode(graft.functions.HyperplaneSignatures(col(vecCol), planes)))
      .select(col(idCol), col(vecCol), col("nrm"),
        struct(col("pos").as("table"), col("col").as("sig")).as("bucket"))
    signed.select(col(idCol).as("a"), col(vecCol).as("a_vec"),
        col("nrm").as("a_norm"), col("bucket"))
      .join(signed.select(col(idCol).as("b"), col(vecCol).as("b_vec"),
        col("nrm").as("b_norm"), col("bucket")), Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cosine",
        round(safeCosine(dotCol(col("a_vec"), col("b_vec")), col("a_norm") * col("b_norm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
      .distinct()
  }

  /** DuckDB oracle for [[cosineNearDupPairs]] over `_aux/ann_nd_planes`
    * (first `numTables` tables): reproduces the signature computation, the
    * bucket self-join, pair dedup and the exact cosine verification. The
    * aux table carries exactly the auto-sized plane count the Spark side
    * resolved for the same corpus, so the two stay in lockstep without the
    * SQL string embedding a data-dependent parameter. */
  def duckDbCosineNearDupSql(table: String, threshold: Double, numTables: Int,
                             idCol: String, vecCol: String): String = s"""
    WITH emb AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM $table),
    pl AS (SELECT tbl, plane_idx, plane
           FROM read_parquet('__VOUT__/_aux/ann_nd_planes/*.parquet')
           WHERE tbl < $numTables),
    sigs AS (SELECT e.vid, p.tbl,
               SUM(CASE WHEN list_dot_product(e.v, p.plane) > 0
                        THEN (1::BIGINT << p.plane_idx) ELSE 0 END) AS sig
             FROM emb e CROSS JOIN pl p GROUP BY e.vid, p.tbl),
    cand AS (SELECT DISTINCT s1.vid AS a, s2.vid AS b
             FROM sigs s1 JOIN sigs s2
               ON s1.tbl = s2.tbl AND s1.sig = s2.sig AND s1.vid < s2.vid),
    scored AS (SELECT c.a, c.b,
                 ROUND(${safeCosineSql("list_dot_product(ae.v, be.v)",
                   "sqrt(list_dot_product(ae.v, ae.v)) * sqrt(list_dot_product(be.v, be.v))")}, 4) AS cosine
               FROM cand c
               JOIN emb ae ON ae.vid = c.a
               JOIN emb be ON be.vid = c.b)
    SELECT a, b, cosine FROM scored WHERE cosine >= $threshold
    ORDER BY a, b"""

  /** Deterministic SPHERICAL k-means coarse quantizer for [[ivfTopK]]:
    * seeded init (corpus rows ranked by `xxhash64(id, seed)`), `iters`
    * Lloyd rounds over unit-normalized vectors — cosine neighbors then
    * share cells, which raw-L2 cells do not guarantee.
    * Assignment is one codegen'd scan per round
    * ([[graft.functions.NearestCentroid]]); the per-cell mean is aggregated
    * in DECIMAL so the result is bit-stable under shuffle reordering (a
    * Double sum's value depends on partition arrival order — the centroids,
    * and with them every downstream assignment, must not).
    *
    * `fitSampleMod ≤ 0` (the default) AUTO-SIZES the Lloyd fit sample from
    * [[corpusCount]] so the fit stays bounded near [[IvfFitTarget]] vectors
    * regardless of corpus scale — at 10M vectors the full-corpus fit was
    * 76.8 s of mostly-Lloyd wall for a coarse quantizer a 100k sample
    * estimates just as well; assignment stays a full scan either way. */
  def kMeansCentroids(embeddings: DataFrame, nCells: Int, iters: Int, dim: Int,
                      seed: Long = 42L, idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      fitSampleMod: Int = 0): Array[Array[Double]] = {
    val mod = if (fitSampleMod > 0) fitSampleMod
              else autoFitSampleMod(corpusCount(embeddings))
    // deterministic 1/mod sample for the Lloyd rounds (hash-gated, so the
    // fit is reproducible run to run — .sample() is not); the final corpus
    // ASSIGNMENT in ivfTopK always scans everything
    val fit = if (mod <= 1) embeddings
              else embeddings.filter(
                pmod(xxhash64(col(idCol), lit(seed + 1)), lit(mod)) === 0)
    val init = fit
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(nCells)
      .orderBy(col(idCol))
      .select(col(vecCol)).collect()
      .map(r => normalized(vecFloats(r.getSeq[Any](0))))
    // `dim` sizes the Lloyd update arrays: a longer vector would throw
    // AIOOBE mid-round, a shorter one would silently zero-pad centroids
    init.foreach(v => require(v.length == dim,
      s"$vecCol length ${v.length} != dim $dim — pass the actual dimension"))
    var centroids = init
    var it = 0
    while (it < iters) {
      val assigned = fit.select(
        graft.functions.NearestCentroid(col(vecCol), centroids, normalize = true)
          .as("cell"),
        normCol(col(vecCol)).as("nrm"), posexplode(col(vecCol)))
      val means = assigned
        // a zero vector has no direction: col/nrm would be NaN (ANSI: a
        // cast error) — it contributes nothing to a mean DIRECTION, so
        // drop it from the update (it still gets assigned a cell on scan)
        .filter(col("nrm") > 0)
        .groupBy(col("cell"), col("pos"))
        .agg((sum((col("col").cast("double") / col("nrm")).cast("decimal(27,10)"))
          / count(lit(1))).cast("double").as("m"))
        .collect()
      val next = Array.fill(centroids.length)(new Array[Double](dim))
      // cells that lost every member keep their previous centroid
      centroids.zipWithIndex.foreach { case (c, i) => c.copyToArray(next(i)) }
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // SPHERICAL k-means: the mean of unit vectors has norm < 1, and by a
      // different amount per cell (tight cluster ≈ 1, diffuse ≈ 0.5) —
      // leaving centroids unnormalized biases the next round's
      // nearest-centroid assignment toward diffuse cells instead of the
      // max-cosine cell. Renormalize every round (c := mean(v̂)/|mean(v̂)|,
      // the textbook update); a degenerate all-zero mean keeps its length.
      next.foreach { c =>
        var ss = 0.0; var j = 0
        while (j < dim) { ss += c(j) * c(j); j += 1 }
        if (ss > 0) { val nrm = math.sqrt(ss); j = 0; while (j < dim) { c(j) /= nrm; j += 1 } }
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Lloyd-fit sample target: ~100k vectors bounds the k-means fit cost at
    * any corpus scale; the coarse-quantizer centroid estimate converges far
    * below this, and the cells only gate which candidates get EXACTLY
    * rescored — recall, not correctness, is at stake. */
  val IvfFitTarget = 100000L

  /** Hash-gate modulus putting the expected fit sample at `target`. */
  def autoFitSampleMod(n: Long, target: Long = IvfFitTarget): Int =
    math.max(1L, (n + target - 1) / target).toInt

  /** Driver-side vector read tolerant of float AND double columns — every
    * distributed path branches on the element type (HyperplaneSignatures,
    * DotProduct, NearestCentroid), so the collects must too or an
    * array<double> embedding column crashes only the IVF op. */
  private def vecFloats(s: Seq[Any]): Array[Float] = {
    val out = new Array[Float](s.length)
    var i = 0
    s.foreach { v =>
      out(i) = v match {
        case f: java.lang.Float  => f.floatValue
        case d: java.lang.Double => d.floatValue
        case null                => 0f
        case other => throw new IllegalArgumentException(
          s"embedding element of type ${other.getClass.getName}")
      }
      i += 1
    }
    out
  }

  private def normalized(v: Array[Float]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
    val nrm = if (ss == 0.0) 1.0 else math.sqrt(ss)
    v.map(_.toDouble / nrm)
  }

  /** Approximate top-k via IVF (inverted-file) indexing: assign the corpus
    * to `nCells` k-means cells ONCE (codegen'd scan), then each query
    * exactly re-scores only the `nProbe` cells nearest to it — candidates
    * via a broadcast equi-join on the cell id, so each query touches
    * ~|corpus|·nProbe/nCells rows and nothing quadratic exists. The cell
    * choice ranks by (distance, cell) for determinism. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nCells: Int = 16, nProbe: Int = 4, iters: Int = 3, dim: Int = 64,
              seed: Long = 42L, idCol: String = "vec_id",
              vecCol: String = "embedding", fitSampleMod: Int = 0): DataFrame = {
    val centroids = kMeansCentroids(embeddings, nCells, iters, dim, seed, idCol,
      vecCol, fitSampleMod)
    val assigned = embeddings.select(col(idCol).as("match_id"), col(vecCol).as("m_vec"),
      normCol(col(vecCol)).as("m_norm"),
      graft.functions.NearestCentroid(col(vecCol), centroids, normalize = true)
        .as("cell"))
    // queries are few by contract (same as bruteForceTopK's broadcast side):
    // probe cells chosen driver-side with the same squared-L2 the assignment
    // uses
    val qRows = embeddings.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), vecFloats(r.getSeq[Any](1))))
    val probes = qRows.toSeq.flatMap { case (qid, raw) =>
      val v = normalized(raw)
      centroids.zipWithIndex.map { case (c, cell) =>
        var d = 0.0
        var i = 0
        while (i < math.min(v.length, c.length)) {
          val t = v(i) - c(i); d += t * t; i += 1
        }
        (qid, cell, d)
      }.sortBy { case (_, cell, d) => (d, cell) }.take(nProbe)
        .map { case (q, cell, _) => (q, cell) }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("query_id", "cell")
    val queries = embeddings.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        normCol(col(vecCol)).as("q_norm"))
      .join(probeDf, Seq("query_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id"))
    // score before the safety dedup (a match lives in exactly one cell, but
    // the dedup still forces a shuffle — let it carry (ids, cosine), not
    // two 64-double vectors per candidate)
    broadcast(queries).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("match_id"))
      .withColumn("cosine",
        round(safeCosine(dotCol(col("q_vec"), col("m_vec")), col("q_norm") * col("m_norm")), 4))
      .select("query_id", "match_id", "cosine")
      .dropDuplicates("query_id", "match_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("match_id"), col("cosine"))
  }

  /** DuckDB oracle for [[ivfTopK]] over `_aux/ivf_centroids` (the fitted
    * centroids as DOUBLE[] rows): re-derives the corpus cell assignment and
    * per-query probe ranking with `list_distance` (monotone in the Scala
    * side's squared L2, ties broken by cell), the candidate cell join and
    * the exact rescoring — only the k-means FIT itself rides along. */
  def duckDbIvfTopKSql(table: String, queryIds: Seq[Long], k: Int, nProbe: Int,
                       idCol: String, vecCol: String): String = s"""
    WITH emb AS (SELECT $idCol AS vid, $vecCol::DOUBLE[] AS v FROM $table),
    cent AS (SELECT cell, centroid FROM read_parquet('__VOUT__/_aux/ivf_centroids/*.parquet')),
    nemb AS (SELECT vid, v,
                    list_transform(v, x -> x / (CASE WHEN list_dot_product(v, v) = 0
                           THEN 1 ELSE sqrt(list_dot_product(v, v)) END)) AS nv
             FROM emb),
    dists AS (SELECT e.vid, c.cell, list_distance(e.nv, c.centroid) AS d
              FROM nemb e CROSS JOIN cent c),
    assign AS (SELECT vid, cell FROM (
                 SELECT vid, cell,
                        ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cell) AS rn
                 FROM dists) WHERE rn = 1),
    probe AS (SELECT vid AS query_id, cell FROM (
                SELECT vid, cell,
                       ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d, cell) AS rn
                FROM dists WHERE vid IN (${queryIds.mkString(", ")}))
              WHERE rn <= $nProbe),
    cand AS (SELECT DISTINCT p.query_id, a.vid AS match_id
             FROM probe p JOIN assign a ON a.cell = p.cell
             WHERE a.vid <> p.query_id),
    scored AS (SELECT c.query_id, c.match_id,
                 ROUND(${safeCosineSql("list_dot_product(qe.v, me.v)",
                   "sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(me.v, me.v))")}, 4) AS cosine
               FROM cand c
               JOIN emb qe ON qe.vid = c.query_id
               JOIN emb me ON me.vid = c.match_id)
    SELECT query_id, rank, match_id, cosine FROM (
      SELECT query_id, match_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, match_id) AS rank
      FROM scored)
    WHERE rank <= $k
    ORDER BY query_id, rank"""

  /** Approximate top-k via MULTI-TABLE hyperplane LSH: `numTables`
    * independent tables of `planesPerTable` hyperplanes each; a corpus
    * vector is a candidate if it lands in the query's bucket in ANY table
    * (union of candidates → much higher recall than one wide table; for a
    * per-table match probability q, recall is 1-(1-q)^L). Each table's
    * bucket join is an equi-join → shuffle on (table, bucket) keys only; no
    * cross join ever materializes, and candidates are scored exactly. */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              numTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireDim(embeddings, vecCol, dim)
    // All tables' sign-bit signatures in ONE native-expression pass (the
    // Column-composed per-plane form built a ~3000-literal tree whose
    // analysis + Janino compile dominated the query; see
    // graft.functions.HyperplaneSignatures). Values are bit-identical.
    val planes: Array[Array[Array[Double]]] =
      (0 until numTables).map(t => hyperplanes(dim, planesPerTable, seed = 42L + t)).toArray
    val signed = embeddings
      .select(col(idCol), col(vecCol),
        posexplode(graft.functions.HyperplaneSignatures(col(vecCol), planes)))
      .select(col(idCol), col(vecCol),
        struct(col("pos").as("table"), col("col").as("sig")).as("bucket"))
    val queries = signed.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        normCol(col(vecCol)).as("q_norm"), col("bucket"))
    val corpus = signed.select(col(idCol).as("match_id"), col(vecCol).as("m_vec"),
      normCol(col(vecCol)).as("m_norm"), col("bucket"))
    // cosine is computed BEFORE the candidate dedup: a pair surfacing from
    // several tables scores identically each time, so scoring map-side (64
    // codegen'd multiplies on rows already in hand) lets the dedup shuffle
    // carry (ids, cosine) instead of two 64-double vectors per row
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id"))
    broadcast(queries).join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("match_id"))
      .withColumn("cosine",
        round(safeCosine(dotCol(col("q_vec"), col("m_vec")), col("q_norm") * col("m_norm")), 4))
      .select("query_id", "match_id", "cosine")
      .dropDuplicates("query_id", "match_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("match_id"), col("cosine"))
  }
}
