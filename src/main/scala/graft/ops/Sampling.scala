package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * Everything here is pure integer arithmetic on the document id — no RNG,
  * no `rand()` — so the same row lands in the same split on every engine,
  * every run, every cluster size (reproducible pipelines survive re-runs and
  * backfills). The mixer is expressible identically in Spark Columns and
  * ANSI SQL, which is what makes the driver's DuckDB oracle exact.
  *
  * At 100 TB these are embarrassingly parallel rowwise expressions inside
  * whole-stage codegen: no shuffle, no UDF, no state.
  */
object Sampling {

  /** 32-bit multiply-xorshift mixer → bucket in [0, nBuckets).
    * Constants: Knuth 2654435761 (golden-ratio multiplier), LCG 69069.
    * The id (non-negative, as row ids are — DuckDB's floor division and
    * Spark's logical shift disagree on negatives) is first folded to 31
    * bits (high bits XORed in, not dropped) so every later multiply stays
    * < 2^62 — no ANSI overflow for any non-negative BIGINT id, which
    * matters once doc ids pass ~3.4e9 (a trillion-doc corpus). */
  def bucketCol(id: Column, nBuckets: Int, salt: Int = 0): Column = {
    // XOR the salt in (addition could overflow at Long.MaxValue under ANSI)
    val s = id.bitwiseXOR(lit(salt.toLong))
    val folded = pmod(s.bitwiseXOR(shiftrightunsigned(s, 31)), lit(2147483648L))
    val h0 = pmod(folded * lit(2654435761L), lit(4294967296L))
    val h1 = h0.bitwiseXOR(shiftrightunsigned(h0, 16))
    val h2 = pmod(h1 * lit(69069L), lit(4294967296L))
    val h3 = h2.bitwiseXOR(shiftrightunsigned(h2, 13))
    pmod(h3, lit(nBuckets.toLong))
  }

  /** DuckDB twin of [[bucketCol]] (same constants, same operation order). */
  def duckDbBucketSql(idExpr: String, nBuckets: Int, salt: Int = 0): String = {
    val s = s"xor($idExpr, $salt)"
    val folded = s"(xor($s, $s // 2147483648) % 2147483648)"
    val h0 = s"(($folded * 2654435761) % 4294967296)"
    val h1 = s"xor($h0, $h0 // 65536)"
    val h2 = s"(($h1 * 69069) % 4294967296)"
    val h3 = s"xor($h2, $h2 // 8192)"
    s"($h3 % $nBuckets)"
  }

  /** Train/valid/test assignment over 100 hash buckets (80/10/10). */
  def splitCol(id: Column): Column = {
    val b = bucketCol(id, 100)
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")
  }

  def duckDbSplitSql(idExpr: String): String = {
    val b = duckDbBucketSql(idExpr, 100)
    s"CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'valid' ELSE 'test' END"
  }

  /** Stratified downsample: keep a row iff its (independently salted) hash
    * bucket falls under the stratum's percentage. `rates` maps stratum value
    * → keep-percent; strata not in the map keep `defaultPct`. */
  def stratifiedKeepCol(id: Column, stratum: Column,
                        rates: Map[String, Int], defaultPct: Int): Column = {
    val b = bucketCol(id, 100, salt = 7919)
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratum === k, v).otherwise(acc)
    }
    b < pct
  }

  def duckDbStratifiedKeepSql(idExpr: String, stratumExpr: String,
                              rates: Map[String, Int], defaultPct: Int): String = {
    val b = duckDbBucketSql(idExpr, 100, salt = 7919)
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN ($stratumExpr) = '$k' THEN $v" }.mkString(" ")
    s"($b < (CASE $cases ELSE $defaultPct END))"
  }

  /** Per-stratum deterministic split + downsample in one pass: doc id,
    * stratum, split label, keep flag. The driver query over `documents`
    * stratifies by predicted language, downsampling the dominant stratum —
    * the classic corpus-rebalancing step. */
  def assign(docs: DataFrame, stratum: Column, rates: Map[String, Int],
             defaultPct: Int, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), stratum.as("stratum"),
        splitCol(col(idCol)).as("split"),
        stratifiedKeepCol(col(idCol), stratum, rates, defaultPct).as("sampled"))
}
