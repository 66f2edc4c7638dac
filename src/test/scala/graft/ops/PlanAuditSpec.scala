package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the pipeline operators' scale
  * properties — the shapes SCALE.md documents (no cartesian blowups, the
  * intended broadcasts, shuffle-free rowwise paths, heap-based top-N) must
  * survive refactors, not just the output values. AQE is disabled so the
  * static plan is inspectable (same trick as graft.Explain). */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  import spark.implicits._

  lazy val docs = (0L until 200L)
    .map(i => (i, s"tok${i % 7} tok${(i + 1) % 5} tok${(i + 2) % 3} end$i"))
    .toDF("doc_id", "text")
  lazy val embeddings = (0L until 100L)
    .map(i => (i, Array.tabulate(8)(d => ((i * 31 + d) % 17).toFloat / 17f)))
    .toDF("vec_id", "embedding")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("sampling assign is a single codegen'd projection - no exchange, no join") {
    val p = plan(Sampling.assign(docs, lit("x"), Map("x" -> 50), 100))
    assert(!p.contains("Exchange"), s"rowwise path must not shuffle:\n$p")
    assert(!p.contains("Join"), "no join in the hash-assign path")
  }

  test("vocabulary top-N is a TakeOrdered, never a global sort") {
    val p = plan(TextAnalysis.vocabulary(docs, 10))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$p")
  }

  test("cosine near-dup pairs: keyed joins only, vectors shuffle at input volume only") {
    val p = plan(Similarity.cosineNearDupPairs(embeddings, 0.8, dim = 8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket join must stay keyed:\n$p")
    // vectors may ride ONLY the bucket fan-out exchange (n × numTables
    // rows); the candidate-volume pair-dedup exchange must carry scored
    // (a, b, cosine) triples — scoring and the threshold filter happen
    // map-side inside the join stage
    // (on this tiny fixture the bucket join broadcasts — then no hash
    // exchange carries vectors at all, which also satisfies the invariant)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    val vecExchanges = exchanges.filter(l => l.contains("embedding") || l.contains("_vec"))
    assert(vecExchanges.forall(_.contains("bucket")),
      s"vectors may only ride bucket-keyed exchanges:\n$p")
    val dedupExchanges = exchanges.filter(l => l.contains("a#") && l.contains("cosine"))
    assert(dedupExchanges.forall(l => !l.contains("embedding") && !l.contains("_vec")),
      s"the pair-dedup shuffle must not carry vectors:\n$p")
  }

  test("contamination broadcasts the benchmark shingle set") {
    val p = plan(Dedup.contamination(
      docs.filter($"doc_id" > 10), docs.filter($"doc_id" <= 10), n = 2))
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("minhash verification never force-broadcasts the candidate pair set") {
    // candidates are data-dependent and unbounded (hot bucket of k mutual
    // near-dups → O(k²) pairs); strategy choice must stay with AQE/planner
    val sh = Dedup.shingles(docs, "doc_id", "text", 2, 100)
    val df = Dedup.minhashLshFromShingles(sh, 8, 4, 0.3)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("hint"),
      s"no broadcast/join hint may be forced in the minhash plan:\n$analyzed")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"verification joins must stay keyed:\n$p")
  }

  test("clusters first-round plan: keyed equi-joins only") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = plan(Dedup.clusters(docs.select("doc_id"), pairs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"label propagation must stay keyed:\n$p")
  }

  test("parquet scan under graft projections: filter pushdown + column pruning intact") {
    // the text-analysis projections are pure Column expressions — composing
    // them over a parquet scan must leave source filters pushed into the
    // scan and the ReadSchema pruned to referenced columns (a wrapper that
    // broke pushdown would silently read whole row groups at 100 TB)
    val dir = java.nio.file.Files.createTempDirectory("plan_parquet").toString
    // a third, UNREFERENCED column makes the pruning assertions non-vacuous:
    // with only referenced columns in the fixture, "nothing extra is read"
    // could never fail
    docs.withColumn("payload", lit("x")).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter($"doc_id" > 100L)
      .select($"doc_id",
        TextAnalysis.qualityScoreCol($"text").as("quality"),
        TextAnalysis.langIdCol($"text").as("lang"))
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(doc_id,100)"),
      s"source filter must reach the parquet scan:\n$p")
    // only the two referenced columns may be read — payload must be pruned
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      s"referenced columns read:\n$readSchema")
    assert(!readSchema.contains("payload"),
      s"unreferenced column must be pruned from the wide projection:\n$readSchema")
    // prune check on a narrower projection: text must vanish from the scan
    val narrow = plan(spark.read.parquet(dir).filter($"doc_id" > 100L).select("doc_id"))
    val narrowSchema = narrow.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!narrowSchema.contains("text"),
      s"unreferenced column must be pruned from the scan:\n$narrowSchema")
  }

  test("streaming exact dedup state key is the hash triple, not the text") {
    implicit val sqlCtx = spark.sqlContext
    val sdf = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
      .toDS().toDF("doc_id", "text", "ts")
    val deduped = graft.streaming.StreamingDedup.exactStream(sdf)
    val analyzed = deduped.queryExecution.analyzed.toString
    assert(analyzed.contains("dropDuplicatesWithinWatermark")
      || analyzed.contains("DeduplicateWithinWatermark"), s"state op present:\n$analyzed")
    assert(analyzed.contains("h64") && analyzed.contains("h128"),
      "dedup keys are the hash columns")
  }
}
