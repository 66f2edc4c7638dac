package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions, GraftColumnBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.RollingFingerprint
import graft.ops.{Sampling, TextAnalysis}

/** SQL function surface for graft's scalar operators, so `spark.sql` users
  * get the same codegen'd expressions as the Column API:
  *
  *   - `graft_fingerprint(text, k)` — min rolling k-gram hash (native
  *     Catalyst expression with doGenCode)
  *   - `graft_quality(text)` / `graft_langid(text)` /
  *     `graft_token_count(text)` / `graft_dup_ngram_frac(text, n)` — text
  *     quality / language-ID / token count / repetition
  *   - `graft_bucket(id, n)` / `graft_split(id)` — deterministic hash
  *     bucketing and train/valid/test assignment
  *
  * Two registration paths: `spark.sql.extensions=graft.GraftExtensions` at
  * build time, or `GraftFunctions.register(spark)` on a live session. The
  * composed builders return the SAME expression trees the Column API
  * produces, so plans, codegen and results are identical either way.
  */
object GraftFunctions {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def x(col: Column): Expression = GraftColumnBridge.catalystExpression(col)

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other if other.foldable => other.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case v => throw new IllegalArgumentException(s"$fn: expected int literal, got $v")
    }
    case _ => throw new IllegalArgumentException(s"$fn: argument must be a literal")
  }

  // the five-arg constructor carries the usage string into DESCRIBE
  // FUNCTION without triggering the long form's group/source validation
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name, usage, "")

  // arity guard: a wrong argument count must fail with a named message,
  // not an IndexOutOfBoundsException out of args(i)
  private def nArgs(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = args => {
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")
    b(args)
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_fingerprint",
      info("graft_fingerprint", "graft_fingerprint(text, k) - min rolling k-gram hash"),
      nArgs("graft_fingerprint", 2)(args =>
        RollingFingerprint(args(0), intArg(args(1), "graft_fingerprint")))),
    ("graft_quality",
      info("graft_quality", "graft_quality(text) - composite quality score in [0,1]"),
      nArgs("graft_quality", 1)(args => x(TextAnalysis.qualityScoreCol(c(args(0)))))),
    ("graft_langid",
      info("graft_langid", "graft_langid(text) - stopword-marker language guess"),
      nArgs("graft_langid", 1)(args => x(TextAnalysis.langIdCol(c(args(0)))))),
    ("graft_token_count",
      info("graft_token_count", "graft_token_count(text) - whitespace token count"),
      nArgs("graft_token_count", 1)(args => x(TextAnalysis.tokenCountCol(c(args(0)))))),
    ("graft_dup_ngram_frac",
      info("graft_dup_ngram_frac",
        "graft_dup_ngram_frac(text, n) - duplicated word n-gram fraction"),
      nArgs("graft_dup_ngram_frac", 2)(args => x(TextAnalysis.dupNgramFracCol(
        c(args(0)), intArg(args(1), "graft_dup_ngram_frac"))))),
    ("graft_bucket",
      info("graft_bucket", "graft_bucket(id, n) - deterministic hash bucket in [0,n)"),
      nArgs("graft_bucket", 2)(args =>
        x(Sampling.bucketCol(c(args(0)), intArg(args(1), "graft_bucket"))))),
    ("graft_split",
      info("graft_split", "graft_split(id) - deterministic train/valid/test label"),
      nArgs("graft_split", 1)(args => x(Sampling.splitCol(c(args(0)))))),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      nArgs("graft_dot", 2)(args => graft.functions.DotProduct(args(0), args(1)))),
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays"),
      nArgs("graft_cosine", 2)(args =>
        x(graft.ops.Similarity.cosineCol(c(args(0)), c(args(1)))))),
    ("graft_urlencode",
      info("graft_urlencode",
        "graft_urlencode(s) - percent-encode a URL path element (controls, /?\"`, non-ASCII)"),
      nArgs("graft_urlencode", 1)(args => graft.functions.PercentEncodePath(args(0)))))

  /** Registers every graft function on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      GraftColumnBridge.registerFunction(spark, name, inf, builder)
    }
}

/** Config-time registration: `.config("spark.sql.extensions",
  * "graft.GraftExtensions")` or `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, inf, builder) =>
      ext.injectFunction((FunctionIdentifier(name), inf, builder))
    }
}
