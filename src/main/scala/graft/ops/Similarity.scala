package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products use `zip_with` + `aggregate` — pure Catalyst higher-order
  * functions, codegen'd, summed left-to-right in DOUBLE so the DuckDB oracle
  * (list_dot_product over DOUBLE[]) produces bit-identical values.
  *
  * Brute force is the correctness baseline (query-side broadcast, one pass
  * over the corpus — at 100 TB this is the right shape for SMALL query sets);
  * [[lshTopK]] is the scale path: random-hyperplane signatures bucket the
  * corpus so each query only scores its bucket.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float vectors. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

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
        round(dotCol(col("q_vec"), col("m_vec")) / (col("q_norm") * col("m_norm")), 4))
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
             ROUND(list_dot_product(qv, mv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(mv, mv))), 4) AS cosine
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

  /** Sign-bit signature of a vector against the hyperplanes, as a Column
    * (bit i set ⟺ dot(v, plane_i) > 0). */
  def signatureCol(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
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
                 ROUND(list_dot_product(qe.v, me.v) /
                       (sqrt(list_dot_product(qe.v, qe.v))
                        * sqrt(list_dot_product(me.v, me.v))), 4) AS cosine
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
    val candidates = broadcast(queries).join(corpus, Seq("bucket"))
      .filter(col("query_id") =!= col("match_id"))
      .select("query_id", "q_vec", "q_norm", "match_id", "m_vec", "m_norm")
      .dropDuplicates("query_id", "match_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("match_id"))
    candidates
      .withColumn("cosine",
        round(dotCol(col("q_vec"), col("m_vec")) / (col("q_norm") * col("m_norm")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("match_id"), col("cosine"))
  }
}
