package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingFingerprint
import graft.ops.{Sampling, TextAnalysis}

class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog for it is that"),
    (2L, "der hund und die katze und der vogel und das haus ist"),
    (3L, "a b a b a b a b"),
    (4L, "x")).toDF("doc_id", "text")

  test("SQL functions equal the Column API expressions") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql("""
      SELECT doc_id,
             graft_fingerprint(text, 4) AS fp,
             graft_quality(text) AS q,
             graft_langid(text) AS lang,
             graft_token_count(text) AS n_tok,
             graft_dup_ngram_frac(text, 3) AS rep,
             graft_bucket(doc_id, 100) AS bucket,
             graft_split(doc_id) AS split
      FROM ext_docs ORDER BY doc_id""").collect()
    val viaCols = docs.select(col("doc_id"),
        RollingFingerprint(col("text"), 4).as("fp"),
        TextAnalysis.qualityScoreCol(col("text")).as("q"),
        TextAnalysis.langIdCol(col("text")).as("lang"),
        TextAnalysis.tokenCountCol(col("text")).as("n_tok"),
        TextAnalysis.dupNgramFracCol(col("text"), 3).as("rep"),
        Sampling.bucketCol(col("doc_id"), 100).as("bucket"),
        Sampling.splitCol(col("doc_id")).as("split"))
      .orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCols.toSeq)
    // spot semantics: en/de markers hit, bucket within range
    assert(viaSql(0).getString(3) == "en" && viaSql(1).getString(3) == "de")
    assert(viaSql.forall(r => r.getLong(6) >= 0 && r.getLong(6) < 100))
  }

  test("vector SQL functions equal the Column API and hand arithmetic") {
    val vecs = Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val r = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_cosine(a, b) AS cs FROM ext_vecs").head
    assert(r.getDouble(0) == 32.0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(1) - expected) < 1e-12)
    val viaCol = vecs.select(
      graft.ops.Similarity.dotCol(col("a"), col("b")).as("d"),
      graft.ops.Similarity.cosineCol(col("a"), col("b")).as("cs")).head
    assert(viaCol.getDouble(0) == r.getDouble(0) && viaCol.getDouble(1) == r.getDouble(1))
  }

  test("wrongly-typed graft_* calls fail analysis, not codegen") {
    // int arrays / non-strings must be rejected with a named error at
    // analysis time — not a ClassCastException inside a generated task
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").collect()
    }
    assert(e1.getMessage.contains("dot_product"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_urlencode(123)").collect()
    }
    assert(e2.getMessage.contains("percent_encode_path"))
    // wrong ARITY gets a named message too, not args(i) IndexOutOfBounds
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint('x')").collect()
    }
    assert(e3.getMessage.contains("graft_fingerprint expects 2"),
      s"got: ${e3.getMessage}")
  }

  test("percent-encoding of URL path elements (X14 escape set)") {
    import graft.functions.PercentEncodePath
    val rows = Seq((1L, "Stop 2/α?x=\"y\"`\t\u007f")).toDF("id", "s")
    rows.createOrReplaceTempView("ext_urls")
    val viaSql = spark.sql("SELECT graft_urlencode(s) AS e FROM ext_urls")
      .head.getString(0)
    val viaCol = rows.select(PercentEncodePath(col("s")).as("e")).head.getString(0)
    // space passes (not a control); / ? " ` escape; α = UTF-8 CE B1;
    // tab and DEL are controls — uppercase hex throughout
    assert(viaSql == "Stop 2%2F%CE%B1%3Fx=%22y%22%60%09%7F")
    assert(viaCol == viaSql)
  }

  test("percent-encoding decodes back via the JDK decoder on random strings") {
    // independent-decoder property: whatever the X14 encoder emits must
    // decode to the original through java.net.URLDecoder with the same '+'
    // protection MonitorServer applies to request paths. '%' is EXCLUDED
    // from the pool on purpose: the reference escape set (CONTROLS /?"`
    // + non-ASCII, monitor/mod.rs:25-27) passes a literal '%' through, so
    // a stop name containing '%' is not reversible — faithfully mirrored,
    // not a defect here.
    import graft.functions.PercentEncodePath
    val rnd = new scala.util.Random(777)
    val pool = Seq("a", "Z", "0", " ", "+", "/", "?", "\"", "`", "&", "=",
      "#", "ß", "官", "🚌", "\t", "", ".", "~", ";")
    val inputs = (1 to 200)
      .map(_ => (0 until rnd.nextInt(16)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
      .distinct.filter(_.nonEmpty)
    val df = inputs.toDF("s")
    val encoded = df.select(col("s"), PercentEncodePath(col("s")).as("e"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    encoded.foreach { case (orig, enc) =>
      val back = java.net.URLDecoder.decode(
        enc.replace("+", "%2B"), java.nio.charset.StandardCharsets.UTF_8)
      assert(back == orig, s"decode(${enc}) = $back != $orig")
    }
  }

  test("config-time injection via GraftExtensions resolves the same functions") {
    // a sibling session over the same context, built WITH the extension
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val out = Seq((7L, "the of and to in a")).toDF("doc_id", "text")
      out.createOrReplaceTempView("ext_docs2")
      val r = s2.sql(
        "SELECT graft_langid(text) AS lang, graft_token_count(text) AS n FROM ext_docs2")
        .head
      assert(r.getString(0) == "en" && r.getInt(1) == 6)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
