package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, fingerprinting.
  * All hot-path functions are pure Column expressions (codegen'd, no UDF);
  * each has a DuckDB SQL twin built from the SAME constant tables so the
  * driver oracle can check results exactly.
  */
object TextAnalysis {

  /** Whitespace tokenization. Boundary whitespace produces empty split
    * fields — and `trim` alone only strips ASCII SPACES, so a trailing
    * newline/tab (ubiquitous in real corpora) used to leave a phantom ""
    * token that inflated token counts, entered shingle windows and could
    * reach the vocabulary. `array_remove` drops every empty field (native
    * collection op, codegen'd), covering all whitespace kinds on both
    * boundaries. */
  def tokensCol(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  /** `let`-binding for Column expressions: evaluates `bound` ONCE and feeds
    * it to `body` as a lambda variable. Without it, a composed expression
    * that references e.g. `tokensCol(text)` k times — or worse, inside a
    * `transform` lambda, once per element — re-executes the regex split
    * every time (measured: the bigram scan spent ~95 % of its time
    * re-splitting text per pair). */
  private[ops] def letCol(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  def duckDbTokensSql(textExpr: String): String =
    s"list_filter(string_split_regex($textExpr, '\\s+'), t -> t <> '')"

  // ---- language-ID stopword tables (shared between engines) --------------
  // n-gram/stopword heuristic: score = number of tokens found in each
  // language's marker list, argmax with a fixed tie order (en>de>es>fr).
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "los", "que", "y", "un", "es", "por", "como", "para"),
    "fr" -> Seq("le", "les", "et", "une", "est", "pour", "dans", "au", "ce", "sur"))

  /** Argmax of marker counts with fixed tie order; "und" when no marker
    * hits. Counts come from [[graft.functions.MarkerCounts]] — one native
    * codegen'd pass over the tokens instead of four interpreted
    * `filter(…, isInCollection)` lambdas (higher-order functions never
    * code-generate); count semantics identical. */
  def langIdCol(text: Column): Column =
    // lowercase BEFORE tokenizing: the marker lists are lowercase, and
    // case-sensitive matching classified title-cased prose ("The Sun And
    // The Moon") as "und" because no capitalized stopword ever counted
    letCol(graft.functions.MarkerCounts(tokensCol(lower(text)), LangMarkers.map(_._2))) { cnt =>
      val Seq(en, de, es, fr) = (1 to 4).map(i => element_at(cnt, i))
      when(en >= de && en >= es && en >= fr && en > 0, "en")
        .when(de >= es && de >= fr && de > 0, "de")
        .when(es >= fr && es > 0, "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    }

  def duckDbLangIdSql(textExpr: String): String = {
    val toks = duckDbTokensSql(s"lower($textExpr)")
    def cnt(words: Seq[String]): String = {
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, t -> list_contains($lst, t)))"
    }
    val Seq(en, de, es, fr) = LangMarkers.map(m => cnt(m._2))
    s"""CASE WHEN $en >= $de AND $en >= $es AND $en >= $fr AND $en > 0 THEN 'en'
        WHEN $de >= $es AND $de >= $fr AND $de > 0 THEN 'de'
        WHEN $es >= $fr AND $es > 0 THEN 'es'
        WHEN $fr > 0 THEN 'fr' ELSE 'und' END"""
  }

  // ---- quality scoring ----------------------------------------------------
  // Deterministic arithmetic only (no transcendentals → bit-identical across
  // engines): length/punctuation/digit ratios and a linear composite score.
  def tokenCountCol(text: Column): Column = size(tokensCol(text))

  def punctRatioCol(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[,.!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def digitRatioCol(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def avgTokenLenCol(text: Column): Column =
    length(regexp_replace(trim(text), "\\s", "")).cast("double") /
      greatest(tokenCountCol(text), lit(1))

  /** Composite quality score ∈ [0,1]: favors 20-200 token docs with ~5-char
    * words and little punctuation. Linear, engine-portable. Truncated (not
    * rounded) to 4 decimals: ROUND diverges between engines on exact .5
    * boundaries (Spark rounds the decimal string, DuckDB the binary value),
    * while FLOOR of the identical double is deterministic everywhere. */
  /** Quality in integer basis points (raw score × 10000, floored) — the
    * exact-arithmetic form aggregations should sum (averaging the
    * 4-decimal doubles directly diverges across engines with summation
    * order; averaging exact integers cannot). */
  def qualityBpCol(text: Column): Column = letCol(tokensCol(text)) { toks =>
    val nTok = size(toks)
    val avgLen = length(regexp_replace(trim(text), "\\s", "")).cast("double") /
      greatest(nTok, lit(1))
    val lenScore = least(nTok.cast("double") / 50.0, lit(1.0))
    val wordScore = lit(1.0) - least(abs(avgLen - 5.0) / 10.0, lit(1.0))
    floor((lenScore * 0.5 + wordScore * 0.5) * (lit(1.0) - punctRatioCol(text)) * 10000)
      .cast("long")
  }

  def qualityScoreCol(text: Column): Column =
    qualityBpCol(text).cast("double") / 10000

  // ---- within-doc repetition (Gopher-style quality filter) ----------------

  /** Fraction of duplicated word n-grams within a document — the classic
    * repetition signal for filtering boilerplate/spam (high value = the doc
    * repeats itself). 0 when the doc has fewer than n tokens. Pure Column
    * arithmetic (array ops in codegen, no shuffle, no UDF); n-grams are
    * compared via `xxhash64` of the token window, same trick as the shingle
    * index (string n-grams never materialize). */
  /** Repetition in integer basis points (fraction × 10000, floored) — see
    * [[qualityBpCol]] for why aggregations want the integer form. */
  def dupNgramBpCol(text: Column, n: Int = 3): Column =
    // null text stays null (like qualityBpCol) so a report averaging both
    // metrics computes them over the same effective doc set — otherwise(0)
    // counted null docs as perfectly non-repetitive
    when(text.isNull, lit(null).cast("long")).otherwise(
      letCol(graft.functions.ShingleHashes(tokensCol(text), n)) { grams =>
        when(size(grams) > 0,
          floor((size(grams) - size(array_distinct(grams))).cast("double") * 10000 /
            size(grams)).cast("long"))
          .otherwise(lit(0L))
      })

  def dupNgramFracCol(text: Column, n: Int = 3): Column =
    dupNgramBpCol(text, n).cast("double") / 10000

  /** DuckDB twin of [[dupNgramBpCol]] (string n-grams — hash equality ⟺
    * string equality up to negligible 64-bit collisions). */
  def duckDbDupNgramBpSql(textExpr: String, n: Int = 3): String = {
    val toks = duckDbTokensSql(textExpr)
    val grams = s"""(CASE WHEN len($toks) >= $n THEN
      list_transform(range(len($toks) - $n + 1),
        i -> array_to_string(($toks)[i+1:i+$n], ' '))
      ELSE []::VARCHAR[] END)"""
    s"""(CASE WHEN $textExpr IS NULL THEN NULL
      WHEN len($grams) > 0 THEN
      CAST(FLOOR((len($grams) - len(list_distinct($grams))) * 10000.0
        / len($grams)) AS BIGINT)
      ELSE 0 END)"""
  }

  /** DuckDB oracle twin of [[dupNgramFracCol]]. */
  def duckDbDupNgramFracSql(textExpr: String, n: Int = 3): String =
    s"(${duckDbDupNgramBpSql(textExpr, n)} / 10000.0)"

  // ---- corpus vocabulary --------------------------------------------------

  /** Corpus vocabulary: top-N tokens by term frequency with document
    * frequency. The workhorse behind tokenizer training, stopword mining and
    * corpus drift checks. Scale shape: explode + groupBy(token) is
    * map-side-combinable partial aggregation; the distinct-doc count rides
    * the same shuffle via Spark's distinct-aggregate rewrite; top-N is a
    * TakeOrdered (per-partition heap + driver merge of N rows), never a full
    * sort. (tf DESC, token) is a total order, so the cut is deterministic. */
  def vocabulary(docs: DataFrame, topN: Int = 100, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc"), explode(tokensCol(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc")).as("df"))
      .orderBy(desc("tf"), asc("token"))
      .limit(topN)

  /** Per-(lang, source) corpus report: the standard pipeline health check
    * after every filter stage — doc counts, token volume, mean quality,
    * median doc length, mean repetition. One map-side-combinable groupBy
    * over rowwise codegen'd inputs (the median is the only sort-based
    * aggregate, computed per tiny group). */
  /** Per-(lang, source) corpus report: the standard pipeline health check
    * after every filter stage — doc counts, token volume, mean quality,
    * median doc length, mean repetition. One map-side-combinable groupBy
    * over rowwise codegen'd inputs (the median is the only sort-based
    * aggregate, computed per group). Quality/repetition average their exact
    * integer basis points — summing engine-rounded doubles diverges with
    * summation order, summing integers cannot; the one double division per
    * group is bit-identical everywhere, and FLOOR of identical doubles
    * agrees. The median of integers is k or k+0.5 — exactly representable,
    * so its 1-decimal rounding is also engine-stable. */
  def corpusReport(docs: DataFrame, langCol: String = "lang",
                   sourceCol: String = "source", textCol: String = "text"): DataFrame =
    docs.select(col(langCol).as("lang"), col(sourceCol).as("source"),
        tokenCountCol(col(textCol)).as("n_tok"),
        qualityBpCol(col(textCol)).as("q_bp"),
        dupNgramBpCol(col(textCol)).as("rep_bp"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        (floor(avg("q_bp")) / 10000).as("avg_quality"),
        round(percentile(col("n_tok"), lit(0.5)), 1).as("med_tokens"),
        (floor(avg("rep_bp")) / 10000).as("avg_repetition"))

  /** DuckDB oracle twin of [[corpusReport]]. */
  def duckDbCorpusReportSql(table: String, langCol: String, sourceCol: String,
                            textCol: String): String = s"""
    SELECT $langCol AS lang, $sourceCol AS source,
           COUNT(*) AS n_docs,
           SUM(len(${duckDbTokensSql(textCol)}))::BIGINT AS n_tokens,
           FLOOR(AVG(${duckDbQualityBpSql(textCol)})) / 10000 AS avg_quality,
           ROUND(quantile_cont(len(${duckDbTokensSql(textCol)}), 0.5), 1) AS med_tokens,
           FLOOR(AVG(${duckDbDupNgramBpSql(textCol)})) / 10000 AS avg_repetition
    FROM $table GROUP BY 1, 2"""

  /** Adjacent-token-pair counts, top-N — the first merge-candidate scan of
    * BPE tokenizer training. Same scale shape as [[vocabulary]]: rowwise
    * explode, map-side-combinable count, TakeOrdered cut on the total order
    * (cnt DESC, pair). */
  def bigramPairs(docs: DataFrame, topN: Int = 50, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    // tokens materialize as a column BEFORE the pair expression — embedding
    // tokensCol here re-runs the regex split per element.
    // arrays_zip over two slices instead of transform(sequence(...)): the
    // higher-order transform evaluates its lambda INTERPRETED once per
    // element (plus an element_at each side), while arrays_zip builds the
    // pair array in one native pass — same (tok_a, tok_b) rows (slice 1 is
    // tokens 1..n-1, slice 2 is tokens 2..n).
    val toks = col("__toks")
    val pairs = when(size(toks) >= 2,
      arrays_zip(slice(toks, lit(1), size(toks) - 1).as("tok_a"),
        slice(toks, lit(2), size(toks) - 1).as("tok_b")))
      .otherwise(array().cast("array<struct<tok_a:string,tok_b:string>>"))
    docs.select(tokensCol(col(textCol)).as("__toks"))
      .select(explode(pairs).as("p"))
      .select(col("p.tok_a"), col("p.tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("tok_a"), asc("tok_b"))
      .limit(topN)
  }

  /** DuckDB oracle twin of [[bigramPairs]]. */
  def duckDbBigramPairsSql(table: String, topN: Int, idCol: String,
                           textCol: String): String = s"""
    WITH toks AS (SELECT $idCol AS doc, ${duckDbTokensSql(textCol)} AS t FROM $table),
    series AS (SELECT unnest(range(0,
                 (SELECT COALESCE(MAX(len(t)), 0) + 1 FROM toks))) AS i),
    pairs AS (SELECT t[i+1] AS tok_a, t[i+2] AS tok_b
              FROM toks JOIN series ON i <= len(t) - 2)
    SELECT tok_a, tok_b, COUNT(*) AS cnt FROM pairs
    GROUP BY tok_a, tok_b ORDER BY cnt DESC, tok_a, tok_b LIMIT $topN"""

  /** Common-token ratio in integer basis points: the fraction of a doc's
    * tokens that fall in the corpus's top-`vocabN` vocabulary — the
    * transcendental-free stand-in for LM-perplexity filtering (low ratio =
    * rare-token-heavy doc). Two-stage: the tiny top-N vocab broadcasts back
    * against the exploded token stream, so the corpus side never shuffles
    * tokens; the per-doc ratio is one map-side-combinable count pair. */
  def commonTokenBpCol(docs: DataFrame, vocabN: Int = 100,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocab = broadcast(vocabulary(docs, vocabN, idCol, textCol)
      .select(col("token"), lit(1).as("in_vocab")))
    docs.select(col(idCol), explode(tokensCol(col(textCol))).as("token"))
      .join(vocab, Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("in_vocab"), lit(0))).as("n_common"))
      .select(col(idCol),
        floor(col("n_common").cast("double") * 10000 / col("n_tok"))
          .cast("long").as("common_bp"))
  }

  /** DuckDB oracle twin of [[commonTokenBpCol]]. */
  def duckDbCommonTokenBpSql(table: String, vocabN: Int, idCol: String,
                             textCol: String): String = s"""
    WITH vocab AS (SELECT token FROM (
      ${duckDbVocabularySql(table, vocabN, idCol, textCol)})),
    tok AS (SELECT $idCol AS doc, unnest(${duckDbTokensSql(textCol)}) AS token
            FROM $table)
    SELECT doc AS $idCol,
           CAST(FLOOR(SUM(CASE WHEN token IN (SELECT token FROM vocab)
                               THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT)
             AS common_bp
    FROM tok GROUP BY doc ORDER BY doc"""

  /** DuckDB oracle twin of [[vocabulary]]. */
  def duckDbVocabularySql(table: String, topN: Int, idCol: String,
                          textCol: String): String = s"""
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc) AS df FROM (
      SELECT $idCol AS doc, unnest(${duckDbTokensSql(textCol)}) AS token
      FROM $table)
    GROUP BY token ORDER BY tf DESC, token LIMIT $topN"""

  /** DuckDB twin of [[qualityBpCol]] (integer basis points). */
  def duckDbQualityBpSql(textExpr: String): String = {
    val toks = duckDbTokensSql(textExpr)
    val nTok = s"greatest(len($toks), 1)"
    val punct = s"((length($textExpr) - length(regexp_replace($textExpr, '[,.!?;:]', '', 'g'))) * 1.0 / greatest(length($textExpr), 1))"
    val avgLen = s"(length(regexp_replace(trim($textExpr), '\\s', '', 'g')) * 1.0 / $nTok)"
    s"""CAST(FLOOR((least($nTok * 1.0 / 50.0, 1.0) * 0.5
         + (1.0 - least(abs($avgLen - 5.0) / 10.0, 1.0)) * 0.5)
         * (1.0 - $punct) * 10000) AS BIGINT)"""
  }

  def duckDbQualitySql(textExpr: String): String =
    s"(${duckDbQualityBpSql(textExpr)} / 10000.0)"
}
