package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape first:
  *
  *  - exact:   hash-groupBy on the content (one shuffle of (hash, id) pairs,
  *             never of the content itself at scale);
  *  - n-gram Jaccard: shingle inverted index + self-join, document-frequency
  *             capped so hot shingles cannot go quadratic;
  *  - MinHash+LSH: signature → bands → bucket join; only candidates get the
  *             exact verification;
  *  - SimHash: 64-bit signature, banded by 16-bit chunks (pigeonhole: any
  *             pair within Hamming distance 3 shares ≥1 of 4 exact chunks).
  */
object Dedup {

  /** Exact dedup (hash-groupBy): one row per distinct text with the
    * canonical (minimum) id and the multiplicity. Grouping key is
    * (xxhash64(text), md5(text), length(text)) — 192 effective bits, so the
    * shuffle carries a fixed ~44-byte key per row and NEVER the text itself
    * (shuffling document bodies is the scale-killer at 100 TB); a collision
    * across all three simultaneously is cryptographically negligible. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("h64"), md5(col(textCol)).as("h128"),
        length(col(textCol)).as("text_len"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Distinct word n-gram shingles per doc, document-frequency capped.
    * Public so callers running several dedup variants over the same corpus
    * (e.g. the bench pack) can compute and cache the inverted index once.
    *
    * A shingle is represented by `xxhash64` of its token-array window —
    * never as a joined string: the index then carries one BIGINT per
    * shingle, so every downstream shuffle (df-cap, inverted-index
    * self-join, MinHash signatures) moves 8-byte keys instead of ~25-char
    * strings, and no string is ever materialized (measured 1.8× on the
    * 1M-doc rehearsal). Shingle equality ⟺ hash equality up to 64-bit
    * collisions, negligible at any realistic distinct-shingle count. */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
               n: Int, maxDf: Int): DataFrame = {
    // one-pass native window hashing (graft.functions.ShingleHashes) — the
    // transform(sequence)/xxhash64(slice) composition evaluated the lambda
    // interpreted per window and broke whole-stage codegen on the dominant
    // scan of the dedup family; values are bit-identical
    val exploded = docs
      .select(col(idCol).as("doc"),
        TextAnalysis.tokensCol(col(textCol)).as("__toks"))
      .select(col("doc"), explode(array_distinct(
        graft.functions.ShingleHashes(col("__toks"), n))).as("shingle"))
    // cap document frequency: a shingle appearing in >maxDf docs contributes
    // O(df²) candidate pairs — drop it (standard near-dup practice; the same
    // cap is applied in the DuckDB oracle). maxDf ≤ 0 disables the cap (and
    // its df-count shuffle) for consumers that want hot shingles too, e.g.
    // contamination sweeps.
    if (maxDf <= 0) exploded
    else {
      val dfCounts = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
      exploded.join(dfCounts.filter(col("df") <= maxDf).select("shingle"), "shingle")
    }
  }

  /** n-gram Jaccard near-dup pairs: |A∩B| via the shingle inverted index,
    * |A∪B| = |A|+|B|−|A∩B|. Returns (a, b, jaccard) with a < b and
    * jaccard ≥ threshold. */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 100, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    scopedCache(shingles(docs, idCol, textCol, n, maxDf))(
      ngramJaccardFromShingles(_, threshold))

  /** Run `f` over a cached intermediate, eagerly materialize the (small)
    * pair result, then RELEASE the intermediate — a convenience wrapper
    * must not pin a corpus-sized index in executor storage for the rest of
    * the session. The result is materialized via `localCheckpoint` (NOT a
    * persist: a persisted plan stays registered in the CacheManager until
    * someone unpersists it, so each direct API call in a long-lived process
    * would leak one cached DataFrame's blocks — ADVICE r12; checkpoint
    * blocks are reclaimed with the DataFrame itself), which also truncates
    * the lineage so the result never re-reads the released intermediate.
    * Long-lived pipelines should prefer the `*FromShingles` forms with
    * caller-owned caching (as PipelinePack's memos do). */
  private def scopedCache(intermediate: DataFrame)
                         (f: DataFrame => DataFrame): DataFrame = {
    val cached = intermediate.cache()
    try f(cached).localCheckpoint(true)
    finally cached.unpersist()
  }

  /** As [[ngramJaccard]], over a precomputed (cached) shingle index. */
  def ngramJaccardFromShingles(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("s1").join(sh.as("s2"), "shingle")
      .filter(col("s1.doc") < col("s2.doc"))
      .groupBy(col("s1.doc").as("a"), col("s2.doc").as("b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("n_shingles", "size_a"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("n_shingles", "size_b"), "b")
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Exact SUBSTRING-level dedup — the token-span analogue of the document
    * family (the method of Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": remove repeated substrings, not whole
    * docs): per document, the maximal token spans covered by some n-gram
    * window occurring at least `minCount` times in the CORPUS (within-doc
    * repeats count — a doc repeating its own boilerplate twice is
    * duplicated text). Returns one row per span: (idCol, span_start,
    * span_end), inclusive 0-based TOKEN indices, overlapping/adjacent
    * duplicated windows merged.
    *
    * Scale shape: the corpus shuffles (doc, pos, 8-byte window hash)
    * tuples — never text — once for the occurrence count (map-side partial
    * agg) and once to join the hot-hash set back; deliberately NO df cap
    * (span detection NEEDS the hot windows — dropping them is dropping the
    * very boilerplate the operator exists to find), so a boilerplate-heavy
    * corpus pays a large-but-linear join, not a quadratic pair blowup (no
    * self-join here). The island merge is a per-doc window over DUPLICATED
    * positions only — partition size is bounded by the doc's token count.
    * Window-hash equality stands in for window equality (64-bit xxhash
    * collisions negligible), the pair family's convention.
    *
    * MEMORY BOUND (ADVICE r13): the join back of the hot-shingle set is a
    * shuffled hash join whose build side — unlike the sort-merge join it
    * replaces — cannot spill: the DISTINCT hot shingles (8-byte keys,
    * hash-uniform across tasks) must fit per-task memory, roughly
    * `distinct_hot × ~50 B / shuffle_partitions` per task. That holds by
    * orders of magnitude for boilerplate-shaped corpora (the 30M-doc /
    * 1.6B-token benchmark's hot set is far below its window count), but
    * `minCount = 2` over a highly-duplicated corpus pushes the hot set
    * toward the distinct-window count — if executors OOM in the join-back
    * stage, raise `minCount` or `spark.sql.shuffle.partitions` (the knob
    * is hot-set size per task, not corpus size). */
  def dupSpans(docs: DataFrame, n: Int = 5, minCount: Long = 2,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // the wins index feeds TWO plans (occurrence count + join back), which
    // cannot share an exchange — cache it for the duration, like the
    // shingle index in ngramJaccard. Measured both ways (r13): recomputing
    // the index per consumer instead loses at 10M (167 vs 158 s) AND at 30M
    // where the cache is disk-resident (486 vs 423 s) — the second
    // tokenize+hash pass costs more than the cache churn saves
    scopedCache(docWindows(docs, idCol, textCol, n))(
      dupSpansFromWins(_, n, minCount, idCol))

  /** The positional window-hash index [[dupSpans]] consumes:
    * (doc, pos, shingle), one row per n-gram window occurrence. Long-lived
    * pipelines memoize this (PipelinePack) and use [[dupSpansFromWins]]. */
  def docWindows(docs: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame = docs
    .select(col(idCol).as("doc"),
      TextAnalysis.tokensCol(col(textCol)).as("__toks"))
    .select(col("doc"),
      posexplode(graft.functions.ShingleHashes(col("__toks"), n)))
    .withColumnRenamed("col", "shingle")

  /** As [[dupSpans]], over a precomputed (cached) [[docWindows]] index. */
  def dupSpansFromWins(wins: DataFrame, n: Int, minCount: Long,
                       idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hot = wins.groupBy("shingle").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount).select("shingle")
    val w = Window.partitionBy("doc").orderBy("pos")
    // islands over sorted duplicated window starts: window [p, p+n-1]
    // merges with its predecessor [q, q+n-1] iff p <= q + n (overlap or
    // token-adjacent) — a new span starts exactly when the gap leaves an
    // uncovered token between them.
    // SHUFFLE_HASH on the hot set: the default sort-merge join SORTS the
    // full window index by shingle (the measured wall at 10M docs — 31 GB
    // sort spill on a 16 GB shuffle, r12), but the index side only needs
    // to STREAM past a hash table of the hot set, whose per-task share is
    // tiny (distinct hot shingles / shuffle partitions, 8-byte keys) and
    // cannot skew (distinct keys hash-uniformly). Same shuffles, no big
    // sort.
    wins.join(hot.hint("SHUFFLE_HASH"), "shingle")
      .withColumn("__new",
        when(col("pos") > lag(col("pos"), 1).over(w) + lit(n), 1)
          .when(lag(col("pos"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc"), col("__island"))
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + lit(n - 1)).cast("long").as("span_end"))
      .select(col("doc").as(idCol), col("span_start"), col("span_end"))
  }

  /** The curation pass over [[dupSpans]]: rebuild each document's text with
    * the duplicated spans REMOVED (whitespace-normalized — both the kept
    * text and the oracle rebuild from the token array). One row per doc:
    * (idCol, clean_text, tokens_removed); docs with no duplicated span pass
    * through with tokens_removed = 0, fully-duplicated docs come out empty.
    * The span list joins back broadcast-or-shuffle by doc id and the token
    * filter is a per-row higher-order function over (token, index) — spans
    * per doc are few by construction (maximal, disjoint), so the
    * exists() probe is O(tokens × spans/doc), not corpus-shaped. */
  def stripDupSpans(docs: DataFrame, n: Int = 5, minCount: Long = 2,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    stripFromSpans(docs, dupSpans(docs, n, minCount, idCol, textCol),
      idCol, textCol)

  /** As [[stripDupSpans]], over a precomputed [[dupSpans]] result — the
    * form long-lived pipelines use so the span detection runs once. */
  def stripFromSpans(docs: DataFrame, spans: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val perDoc = spans.groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    // NULL text tokenizes as empty (matching the oracle's COALESCE(text,'')),
    // so a null doc passes through as ('', 0) instead of diverging engines
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn("__toks",
        TextAnalysis.tokensCol(coalesce(col(textCol), lit(""))))
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks")).otherwise(expr(
          // one pass: Spark's filter() lambda takes (element, index)
          """filter(__toks, (t, i) -> NOT exists(__spans,
               s -> i >= s.span_start AND i <= s.span_end))""")))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("tokens_removed"))
  }

  /** The ONE copy of the span-derivation CTE chain both oracle builders
    * share — a merge-rule fix lands once, exactly like the Spark side's
    * single [[dupSpansFromWins]]. NULL text tokenizes as empty via the
    * COALESCE, mirroring [[stripFromSpans]]. */
  private def dupSpansCtes(table: String, n: Int, minCount: Long,
                           idCol: String, textCol: String): String = s"""
    toks AS (
      SELECT $idCol AS doc,
             ${TextAnalysis.duckDbTokensSql(s"COALESCE($textCol, '')")} AS t
      FROM $table),
    series AS (SELECT unnest(range(0,
                 (SELECT COALESCE(MAX(len(t)), 0) + 1 FROM toks))) AS i),
    wins AS (
      SELECT doc, i AS pos, array_to_string(t[i+1:i+$n], ' ') AS shingle
      FROM toks JOIN series ON i <= len(t) - $n),
    hot AS (SELECT shingle FROM wins GROUP BY shingle HAVING COUNT(*) >= $minCount),
    dup AS (SELECT doc, pos FROM wins WHERE shingle IN (SELECT shingle FROM hot)),
    flagged AS (
      SELECT doc, pos,
        CASE WHEN lag(pos) OVER (PARTITION BY doc ORDER BY pos) IS NULL
               OR pos > lag(pos) OVER (PARTITION BY doc ORDER BY pos) + $n
             THEN 1 ELSE 0 END AS new_island
      FROM dup),
    islands AS (
      SELECT doc, pos, SUM(new_island) OVER (PARTITION BY doc ORDER BY pos
        ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged),
    spans AS (
      SELECT doc, MIN(pos) AS span_start, MAX(pos) + $n - 1 AS span_end
      FROM islands GROUP BY doc, island)"""

  /** DuckDB oracle twin of [[stripDupSpans]]: the [[dupSpansCtes]] spans,
    * token positions anti-joined against them, text re-aggregated in
    * token order. */
  def duckDbStripSpansSql(table: String, n: Int, minCount: Long,
                          idCol: String, textCol: String): String = s"""
    WITH ${dupSpansCtes(table, n, minCount, idCol, textCol)},
    pos AS (
      SELECT doc, i, t[i+1] AS tok FROM toks JOIN series ON i <= len(t) - 1),
    kept AS (
      SELECT p.doc, p.i, p.tok FROM pos p
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc = p.doc
                          AND p.i BETWEEN s.span_start AND s.span_end)),
    kept_agg AS (
      SELECT doc, string_agg(tok, ' ' ORDER BY i) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc)
    SELECT t.doc AS $idCol, COALESCE(k.clean_text, '') AS clean_text,
           len(t.t) - COALESCE(k.n_kept, 0) AS tokens_removed
    FROM toks t LEFT JOIN kept_agg k ON k.doc = t.doc
    ORDER BY $idCol"""

  /** DuckDB oracle twin of [[dupSpans]]: string shingles stand in for the
    * window hashes (the pair family's convention), same occurrence count,
    * same island recurrence via window functions. */
  def duckDbDupSpansSql(table: String, n: Int, minCount: Long,
                        idCol: String, textCol: String): String = s"""
    WITH ${dupSpansCtes(table, n, minCount, idCol, textCol)}
    SELECT doc AS $idCol, span_start, span_end
    FROM spans ORDER BY $idCol, span_start"""

  /** DuckDB oracle twin of [[ngramJaccard]] (same shingling, cap, formula). */
  def duckDbNgramJaccardSql(table: String, n: Int, threshold: Double, maxDf: Int,
                            idCol: String, textCol: String): String = s"""
    WITH toks AS (
      SELECT $idCol AS doc, ${TextAnalysis.duckDbTokensSql(textCol)} AS t FROM $table),
    series AS (SELECT unnest(range(0,
                 (SELECT COALESCE(MAX(len(t)), 0) + 1 FROM toks))) AS i),
    sh0 AS (
      SELECT DISTINCT doc, shingle FROM (
        SELECT doc, array_to_string(t[i+1:i+$n], ' ') AS shingle
        FROM toks JOIN series ON i <= len(t) - $n)),
    sh AS (
      SELECT doc, shingle FROM sh0
      ${ // mirror shingles()'s documented convention: maxDf <= 0 disables
         // the df cap — an unconditional HAVING <= 0 would drop EVERY
         // shingle and make the oracle spuriously empty for capless runs
         if (maxDf <= 0) ""
         else s"WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= $maxDf)"}),
    sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
    inter AS (
      SELECT s1.doc AS a, s2.doc AS b, COUNT(*) AS n_common
      FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle AND s1.doc < s2.doc
      GROUP BY 1, 2)
    SELECT a, b, ROUND(n_common * 1.0 / (sa.n_shingles + sb.n_shingles - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = a
    JOIN sizes sb ON sb.doc = b
    WHERE ROUND(n_common * 1.0 / (sa.n_shingles + sb.n_shingles - n_common), 4) >= $threshold
    ORDER BY a, b"""

  /** DuckDB oracle for [[minhashLshFromShingles]] over the aux dumps Verify
    * writes: `_aux/shingles` (the df-capped (doc, shingle-hash) index) and
    * `_aux/minhash_seeded` (per distinct shingle, the 32 seeded hash values
    * the signature minimizes over). Banding compares the per-band signature
    * TUPLES directly — equality of tuples ⟺ equality of the Spark side's
    * xxhash64 bucket ids (up to negligible 64-bit collisions), so the oracle
    * reproduces signature aggregation, banding, the candidate bucket join and
    * the exact-Jaccard verification without needing xxhash64 in SQL. */
  def duckDbMinhashLshSql(numHashes: Int, bands: Int, threshold: Double): String = {
    val rpb = numHashes / bands
    val mins = (0 until numHashes).map(i => s"MIN(h$i) AS mh$i").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (b * rpb until (b + 1) * rpb).map(i => s"mh$i").mkString(", ")
      s"SELECT doc, $b AS band, row($key) AS bkey FROM sigs"
    }.mkString(" UNION ALL ")
    s"""
    WITH sh AS (SELECT doc, shingle FROM read_parquet('__VOUT__/_aux/shingles/*.parquet')),
    seed AS (SELECT * FROM read_parquet('__VOUT__/_aux/minhash_seeded/*.parquet')),
    sigs AS (SELECT sh.doc, $mins FROM sh JOIN seed USING (shingle) GROUP BY sh.doc),
    buckets AS ($bandSelects),
    cands AS (SELECT DISTINCT b1.doc AS a, b2.doc AS b
              FROM buckets b1 JOIN buckets b2
                ON b1.band = b2.band AND b1.bkey = b2.bkey AND b1.doc < b2.doc),
    sizes AS (SELECT doc, COUNT(*) AS ns FROM sh GROUP BY doc),
    inter AS (SELECT c.a, c.b, COUNT(*) AS nc
              FROM cands c
              JOIN sh s1 ON s1.doc = c.a
              JOIN sh s2 ON s2.doc = c.b AND s2.shingle = s1.shingle
              GROUP BY c.a, c.b)
    SELECT a, b, ROUND(nc * 1.0 / (sa.ns + sb.ns - nc), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc = a JOIN sizes sb ON sb.doc = b
    WHERE ROUND(nc * 1.0 / (sa.ns + sb.ns - nc), 4) >= $threshold
    ORDER BY a, b"""
  }

  /** DuckDB oracle for [[simhashPairs]] over `_aux/doc_token_hashes` (one row
    * per token OCCURRENCE with its 64-bit hash): recomputes the 64 bit-sum
    * sign aggregation, reassembles the two's-complement signature, then
    * takes the ALL-PAIRS Hamming ≤ maxHamming result via bit_count(xor).
    * Deliberately stronger than mirroring the banding: equality proves the
    * Spark side's block-combination candidate generation loses no pair. */
  def duckDbSimhashSql(maxHamming: Int): String = {
    val bitSums = (0 until 64)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(", ")
    val sigTerms = (0 until 64)
      .map(i => s"CASE WHEN b$i > 0 THEN ${BigInt(1) << i}::HUGEINT ELSE 0::HUGEINT END")
      .mkString(" + ")
    s"""
    WITH th AS (SELECT doc, h FROM read_parquet('__VOUT__/_aux/doc_token_hashes/*.parquet')),
    bits AS (SELECT doc, $bitSums FROM th GROUP BY doc),
    sigs AS (SELECT doc,
      CAST(CASE WHEN su >= 9223372036854775808::HUGEINT
                THEN su - 18446744073709551616::HUGEINT ELSE su END AS BIGINT) AS sig
      FROM (SELECT doc, ($sigTerms) AS su FROM bits))
    SELECT s1.doc AS a, s2.doc AS b, bit_count(xor(s1.sig, s2.sig)) AS hamming
    FROM sigs s1 JOIN sigs s2 ON s1.doc < s2.doc
    WHERE bit_count(xor(s1.sig, s2.sig)) <= $maxHamming
    ORDER BY a, b"""
  }

  // ---- MinHash + LSH ------------------------------------------------------

  /** Per-doc MinHash signature: numHashes independent permutations
    * approximated by seeded 64-bit hashes of each shingle, banded for LSH. */
  def minhashLsh(docs: DataFrame, n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5, maxDf: Int = 100,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scopedCache(shingles(docs, idCol, textCol, n, maxDf))(
      minhashLshFromShingles(_, numHashes, bands, threshold))

  /** As [[minhashLsh]], over a precomputed (cached) shingle index. */
  def minhashLshFromShingles(sh: DataFrame, numHashes: Int, bands: Int,
                             threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // the index arrives partitioned by SHINGLE (the df-cap join's key), so
    // a doc's rows scatter across every partition and each doc-keyed
    // aggregation below would emit ~(docs × partitions) partial rows — at
    // 1M docs that was ~12 GB of partial-aggregate shuffle. One explicit
    // 16-byte-row repartition by doc (~0.9 GB) lets BOTH aggregations run
    // with their distribution already satisfied: no further exchange.
    val shByDoc = sh.repartition(col("doc"))
    // signature: for each hash index i, min over shingles of the seeded
    // 64-bit hash xxhash64(i, shingle) — an independent hash family without
    // modular arithmetic (ANSI mode makes overflowing multiplies throw).
    val sigCols = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i")
    }
    val sigs = shByDoc.groupBy(col("doc")).agg(sigCols.head, sigCols.tail: _*)

    // bands → bucket key; same (band, bucket) → candidate pair
    val bandCols = (0 until bands).map { bidx =>
      val cols = (bidx * rowsPerBand until (bidx + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(bidx).as("band"), xxhash64(cols: _*).as("bucket")).as(s"band_$bidx")
    }
    val buckets = sigs.select(col("doc") +: bandCols: _*)
      .select(col("doc"), explode(array((0 until bands).map(i => col(s"band_$i")): _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val candidates = buckets.as("b1").join(buckets.as("b2"), Seq("band", "bucket"))
      .filter(col("b1.doc") < col("b2.doc"))
      .select(col("b1.doc").as("a"), col("b2.doc").as("b"))
      .distinct()

    // exact verification of CANDIDATES only (the LSH contract: never compute
    // pairwise similarity outside a shared bucket). The shingle sets roll up
    // to one array row per doc (partial-aggregated, index-row count → doc
    // count), then the candidate ids join against that table twice and the
    // intersection runs map-side — the 53M-row index is never shuffled again
    // for verification (it was: two self-join shuffles of the full index
    // dominated the MinHash wall at 1M docs). The candidate set is
    // data-dependent and unbounded (a hot bucket of k mutual near-dups emits
    // O(k²) pairs), so it carries NO broadcast hint: AQE broadcasts it when
    // it measures small, and above that only the 16-byte id pairs shuffle —
    // docSets is already hash-partitioned by doc from the aggregation, so
    // the array side never re-exchanges either way.
    val docSets = shByDoc.groupBy("doc")
      .agg(collect_set(col("shingle")).as("set"))
      .select(col("doc"), col("set"), size(col("set")).as("n_shingles"))
    val verified = docSets
      .select(col("doc").as("a"), col("set").as("set_a"), col("n_shingles").as("size_a"))
      .join(candidates, Seq("a"))
      .join(docSets.select(col("doc").as("b"), col("set").as("set_b"),
        col("n_shingles").as("size_b")), Seq("b"))
      .withColumn("n_common", size(array_intersect(col("set_a"), col("set_b"))))
    verified
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // ---- Benchmark decontamination ------------------------------------------

  /** Decontamination: flag corpus documents sharing at least one word
    * n-gram with a held-out benchmark set (the standard eval-contamination
    * sweep before training). Returns (doc_id, n_shared_ngrams) for flagged
    * docs only.
    *
    * Scale shape: the benchmark's distinct shingle set is orders of
    * magnitude smaller than the corpus (eval sets are MBs against TBs), so
    * the inner join broadcasts the benchmark side — the corpus-side shingle
    * stream never shuffles; the only wide exchange is the per-doc count of
    * matches, which carries only flagged (doc, count) rows. maxDf ≤ 0 skips
    * the frequency cap (contamination wants hot n-grams too). */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val c = shingles(corpus, idCol, textCol, n, maxDf = 0)
    val b = shingles(benchmark, idCol, textCol, n, maxDf = 0)
      .select("shingle").distinct()
    c.join(broadcast(b), "shingle")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .select(col(idCol), col("n_shared_ngrams"))
  }

  /** DuckDB oracle twin of [[contamination]] for a benchmark defined by a
    * predicate over the same table (string shingles; hash equality ⟺
    * string equality up to negligible 64-bit collisions). */
  def duckDbContaminationSql(table: String, corpusPred: String,
                             benchmarkPred: String, n: Int,
                             idCol: String, textCol: String): String = s"""
    WITH toks AS (
      SELECT $idCol AS doc, $corpusPred AS is_corpus, $benchmarkPred AS is_bench,
             ${TextAnalysis.duckDbTokensSql(textCol)} AS t
      FROM $table),
    series AS (SELECT unnest(range(0,
                 (SELECT COALESCE(MAX(len(t)), 0) + 1 FROM toks))) AS i),
    sh AS (
      SELECT DISTINCT doc, is_corpus, is_bench,
             array_to_string(t[i+1:i+$n], ' ') AS shingle
      FROM toks JOIN series ON i <= len(t) - $n),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE is_bench)
    SELECT doc AS $idCol, COUNT(*) AS n_shared_ngrams
    FROM sh JOIN bench USING (shingle)
    WHERE is_corpus
    GROUP BY doc ORDER BY doc"""

  // ---- Near-dup clustering (connected components) -------------------------

  /** Near-dup clusters: connected components over a (a, b) pair graph.
    * Every document is labeled with the minimum doc id reachable through
    * pairs (singletons label themselves); the canonical representative of a
    * cluster is the member equal to the label. A dedup pipeline keeps the
    * `is_kept` rows and drops the rest — the standard "collapse near-dup
    * clusters to one exemplar" step downstream of MinHash/Jaccard pair
    * finding.
    *
    * Scale shape: iterative min-label propagation. Each round is one
    * equi-join + one map-side-combinable `min` aggregation over (BIGINT,
    * BIGINT) rows, `localCheckpoint` truncates the lineage so round N does
    * not replay rounds 1..N−1, and the loop exits as soon as a round lowers
    * nothing (label sums are strictly decreasing until the fixpoint). Only
    * nodes that appear in a pair enter the loop — the corpus joins back in
    * once at the end — so per-round shuffles scale with the PAIR graph, not
    * the corpus. Rounds needed = graph diameter, which for near-dup
    * components is small (LSH/Jaccard clusters are near-cliques of mutual
    * matches, not long chains); each round also path-halves (label :=
    * label-of-label, pointer doubling), so convergence needs only
    * O(log diameter) rounds — threshold chaining CAN build long paths at
    * corpus scale, and `maxIters` = 25 then covers diameter ~2²⁵. If the
    * loop still exits unconverged it throws rather than silently returning
    * labels that would keep several exemplars per cluster.
    */
  def clusters(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
               maxIters: Int = 25,
               rowsPerPartition: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .cache()
    // initial distinct runs at the session width (nNodes is unknown before
    // it): a hash-aggregate distinct spills gracefully when undersized,
    // unlike the sort-merge joins below — measured surviving 133M nodes at
    // 32 partitions (SCALE.md r15)
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    // SELF-SIZING shuffle width (SCALE.md r15), scoped PER QUERY (ADVICE
    // r15): the halving self-join's sort-merge buffered side holds a
    // task's whole label slice — at 133M nodes on the session default of
    // 32 partitions that slice (~4M rows × 32 concurrent tasks) OOMed one
    // 48 GB JVM. Measured ladder: 32 parts OOM; 34 (the 4M-rows default)
    // completes but spills 25.8 GB; 128 (~1M rows/task) completes with
    // 7.4 GB spill and is ~10% faster — so the sizing targets ~1M rows
    // per task. The width is pinned with explicit `repartition(n, key)`
    // on each shuffle input instead of bumping the session-global
    // `spark.sql.shuffle.partitions` (the old set-and-restore let a
    // concurrent query on the same SparkSession observe the bumped width
    // or restore a stale one, and needed a materialize-before-restore).
    // Widths live in the PLAN now, so laziness is safe and concurrent
    // queries are untouched. `sized` is the identity at or below the
    // session width — the common small-graph path keeps today's plans
    // (AQE free to broadcast the tiny side, no forced corpus shuffle).
    val spark = docs.sparkSession
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def widthFor(rows: Long): Int = math.max(sessionParts,
      math.ceil(rows.toDouble / math.max(1L, rowsPerPartition)).toInt)
    def sized(df: DataFrame, parts: Int, key: Column): DataFrame =
      if (parts > sessionParts) df.repartition(parts, key) else df
    val nNodes = labels.count()
    val loopParts = widthFor(nNodes)
    // convergence probe: labels only ever decrease, so the label sum is
    // strictly decreasing until the fixpoint. Summed as DECIMAL(38,0) —
    // a BIGINT sum overflows (and under ANSI, throws) once node-count ×
    // id-magnitude passes 2^63, which a 100 TB corpus does easily.
    def labelSum(df: DataFrame) =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().get(0)
    var checksum = labelSum(labels)
    var converged = checksum == null // empty pair graph: nothing to propagate
    var iter = 0
    while (!converged && iter < maxIters) {
      val e = sized(edges, loopParts, col("a"))
      val l = sized(labels, loopParts, col("node"))
      val prop = e.join(l, e("a") === l("node"))
        .select(e("b").as("node"), col("label"))
      // the repartition below satisfies the aggregation's required
      // distribution, so partial+final run in one stage past it — the
      // shuffle carries the un-combined union (≤ |edges| rows of 16 B),
      // the same linear volume the implicit exchange moved
      val propagated = sized(labels.union(prop), loopParts, col("node"))
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint() // materialize once — the halving self-join reads it twice
      // path halving: label := label(label). Labels are node ids with
      // label(n) ≤ n invariant, so the lookup is total (coalesce guards the
      // self-label rows the join keeps anyway) and strictly non-increasing —
      // one hop per round becomes doubling, O(log diameter) rounds.
      val lookup = sized(
        propagated.select(col("node").as("ref_node"), col("label").as("ref_label")),
        loopParts, col("ref_node"))
      labels = sized(propagated, loopParts, col("label"))
        .join(lookup, col("label") === col("ref_node"), "left")
        .select(col("node"),
          coalesce(col("ref_label"), col("label")).as("label"))
        .localCheckpoint()
      val next = labelSum(labels)
      converged = next == checksum
      checksum = next
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"near-dup clustering did not converge in $maxIters rounds " +
          "(component diameter beyond ~2^25 — malformed pair graph?)")
    // the final joins run over the CORPUS, which can dwarf the pair graph
    // (ADVICE r15): size them off max(nodes, docs). The count is one
    // zero-column scan of `docs` — parquet answers it from footer row
    // counts; paid once per clusters() call, only so a 1000× corpus never
    // funnels through a pair-graph-sized shuffle.
    val finalParts = widthFor(math.max(nNodes, docs.count()))
    val comp = labels.withColumnRenamed("node", idCol)
    // when comp is small (loopParts at the session width ⇒ well under any
    // broadcast threshold), `sized` leaves docs alone and AQE broadcasts
    // comp — zero corpus shuffle; when the pair graph itself is huge the
    // sort-merge is inevitable and both sides get the corpus-sized width
    val joinParts = if (loopParts > sessionParts) finalParts else sessionParts
    val labeled = sized(docs.select(col(idCol)), joinParts, col(idCol))
      .join(sized(comp, joinParts, col(idCol)), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("cluster_id"))
    // sizes via partial-aggregated groupBy + equi-join, NOT a window over
    // cluster_id: a window sorts each cluster in one partition, so a
    // mega-cluster (the all-identical-boilerplate pathology) becomes one
    // straggler task. At pinned widths the hot key still lands in one
    // partition, but both its consumers stream (the count aggregates, the
    // join-back meets a single sizes row per cluster) — a straggler,
    // never a blowup; below the pin, map-side combine + AQE skew-join
    // keep today's plans.
    val byCluster = sized(labeled, finalParts, col("cluster_id"))
    val sizes = byCluster.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    byCluster.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        (col(idCol) === col("cluster_id")).as("is_kept"))
  }

  /** DuckDB oracle twin of [[clusters]] over the n-gram Jaccard pair graph:
    * transitive closure by recursive CTE (min reachable id ≡ the propagated
    * min label), then the same corpus left-join / size / keep-flag step. */
  def duckDbClustersSql(table: String, n: Int, threshold: Double, maxDf: Int,
                        idCol: String, textCol: String): String = s"""
    WITH RECURSIVE
    pairs AS (SELECT a, b FROM (
      ${duckDbNgramJaccardSql(table, n, threshold, maxDf, idCol, textCol)})),
    edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src),
    lab AS (SELECT d.$idCol AS $idCol,
                   COALESCE(c.cluster_id, d.$idCol) AS cluster_id
            FROM $table d LEFT JOIN comp c ON c.src = d.$idCol)
    SELECT $idCol, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           ($idCol = cluster_id) AS is_kept
    FROM lab ORDER BY $idCol"""

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash per doc: sign-sum of token-hash bits. Computed without a
    * UDF: explode tokens, per-bit ±1 contributions, reassemble the sign bits. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.tokensCol(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"bit_$i")
    }
    val agg = toks.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"bit_$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc"), sig.as("simhash"))
  }

  /** The 6 bit-blocks (offset, width) covering the 64-bit signature for
    * block-combination banding: 4×11 + 2×10 bits. */
  private val simhashBlocks = Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))

  /** SimHash near-dup pairs within `maxHamming` (≤ 3).
    *
    * Candidate generation is the block-combination scheme of Manku et al.
    * (WWW'07, "Detecting Near-Duplicates for Web Crawling"): split the
    * signature into 6 blocks, and for each of the C(6,3) = 20 block
    * combinations band on the concatenated 3-block value (~32 bits). A pair
    * at Hamming distance d ≤ 3 has its differing bits in at most 3 blocks,
    * so at least one combination consists of identical blocks — recall is
    * guaranteed by pigeonhole, exactly as with 4 16-bit chunks. The
    * difference is scale: 16-bit chunks give only 65,536 distinct keys per
    * band, so a billion-doc corpus puts ~15 k docs in EVERY bucket and the
    * bucket self-join goes quadratic before the Hamming filter; 32-bit
    * combination keys give 2³² keys per band, so buckets hold only true
    * near-dup clusters. Cost: 20× banding rows instead of 4× — a linear
    * 5× on a 32-byte row stream, traded against the quadratic term.
    * Verified by popcount of the XOR; the DuckDB oracle recomputes the
    * ALL-PAIRS Hamming result, so it also proves the banding drops nothing. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // recall is guaranteed for maxHamming ≤ 3; above that, candidates must
    // still share one 3-block combination (best effort — same contract the
    // previous 4-chunk banding had above its own ≤3 guarantee)
    scopedCache(simhashSignatures(docs, idCol, textCol)) { sigs =>
    val blockVals = simhashBlocks.map { case (off, w) =>
      shiftrightunsigned(col("simhash"), off).bitwiseAND(lit((1L << w) - 1))
    }
    val bandStructs = simhashBlocks.indices.combinations(3).toSeq.zipWithIndex.map {
      case (combo, ci) =>
        val key = combo.foldLeft(lit(0L)) { (acc, bi) =>
          shiftleft(acc, simhashBlocks(bi)._2).bitwiseOR(blockVals(bi))
        }
        struct(lit(ci).as("band"), key.as("bkey"))
    }
    val bands = sigs.select(col("doc"), col("simhash"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("simhash"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    bands.as("c1").join(bands.as("c2"), Seq("band", "bkey"))
      .filter(col("c1.doc") < col("c2.doc"))
      .select(col("c1.doc").as("a"), col("c2.doc").as("b"),
        col("c1.simhash").as("sig_a"), col("c2.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
    }
  }
}
