package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin document fingerprint as a native Catalyst expression:
  * the minimum of all k-gram rolling hashes of the string (the winnowing
  * family of fingerprints — two documents sharing any k-gram window can
  * collide on the same minimum, making equal fingerprints a cheap near-dup
  * candidate signal at scale).
  *
  * Implemented as an `Expression` with `doGenCode` (not a Scala UDF) so it
  * stays inside whole-stage codegen on the 100 TB path: no serialization
  * boundary, no boxing per row.
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.fingerprint(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.fingerprint($c.toString(), $k)")
}

object RollingFingerprint {
  private val Base = 1000003L
  private val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  private def mulmod(a: Long, b: Long): Long = {
    // 128-bit multiply mod 2^61-1 via Math.multiplyHigh (Java 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    if (r >= Mod) r - Mod else r
  }

  /** Minimum k-gram rolling hash; whole-string hash when len < k. */
  def fingerprint(s: String, k: Int): Long = {
    val n = s.length
    if (n == 0) return 0L
    val kk = math.min(k, n)
    // precompute Base^(kk-1) mod Mod for the roll-off term
    var basePow = 1L
    var i = 0
    while (i < kk - 1) { basePow = mulmod(basePow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < kk) { h = (mulmod(h, Base) + s.charAt(i)) % Mod; i += 1 }
    var min = h
    i = kk
    while (i < n) {
      h = (h - mulmod(s.charAt(i - kk), basePow) % Mod + Mod) % Mod
      h = (mulmod(h, Base) + s.charAt(i)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  def apply(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RollingFingerprint(GraftColumnBridge.expression(c), k))
  }

  /** DuckDB oracle SQL: the same min-of-k-gram-rolling-hashes, computed
    * non-iteratively as Σ c_j·Base^(kk-1-j) mod M per window (equal to the
    * Scala Horner loop because both reduce the polynomial mod the same
    * Mersenne prime) in HUGEINT arithmetic, then MIN over windows. Matches
    * the UTF-16 charAt for ASCII/BMP text. The position series is bounded
    * by the corpus's LONGEST doc — a fixed cap would silently hash partial
    * windows (and drop tail windows) for any doc past it, desynchronizing
    * the oracle from the full-length Scala expression. */
  def duckDbSql(table: String, idCol: String, textCol: String, k: Int): String = s"""
    WITH doc AS (SELECT $idCol AS did, $textCol AS t, length($textCol) AS n FROM $table),
    series AS (SELECT unnest(range(0,
                 (SELECT COALESCE(MAX(n), 0) + 1 FROM doc))) AS i),
    chars AS (SELECT d.did, s.i, unicode(substr(d.t, s.i + 1, 1))::HUGEINT AS c
              FROM doc d JOIN series s ON s.i < d.n),
    pows AS (
      WITH RECURSIVE p(e, v) AS (
        SELECT 0, 1::HUGEINT
        UNION ALL SELECT e + 1, (v * $Base) % $Mod FROM p WHERE e < ${k - 1})
      SELECT e, v FROM p),
    wins AS (SELECT d.did, s.i AS w, LEAST($k, d.n) AS kk
             FROM doc d JOIN series s ON s.i <= d.n - LEAST($k, d.n)
             WHERE d.n > 0),
    hashes AS (
      SELECT w.did, w.w,
             CAST(SUM((c.c * p.v) % $Mod) % $Mod AS BIGINT) AS h
      FROM wins w
      JOIN chars c ON c.did = w.did AND c.i >= w.w AND c.i < w.w + w.kk
      JOIN pows p ON p.e = w.w + w.kk - 1 - c.i
      GROUP BY w.did, w.w),
    fp AS (SELECT did, MIN(h) AS fingerprint FROM hashes GROUP BY did)
    SELECT d.did AS $idCol, COALESCE(f.fingerprint, 0) AS fingerprint
    FROM doc d LEFT JOIN fp f ON f.did = d.did
    ORDER BY d.did"""
}
