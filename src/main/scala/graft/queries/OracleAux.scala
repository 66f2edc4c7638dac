package graft.queries

import org.apache.spark.sql.SparkSession

/** Writes the auxiliary oracle-input parquet tables under `<outDir>_aux/`.
  *
  * Several driver queries compute over inputs DuckDB cannot reach from the
  * sf tables alone — the GTFS fixture pipeline's decoded rt rows and derived
  * schedule, and the 64-bit hash values (xxhash64 has no DuckDB equivalent).
  * Verify dumps those inputs here and substitutes the `__VOUT__` token in
  * each oracle's SQL with the real outDir, so the driver's DuckDB gate can
  * reconstruct every downstream step (joins, windows, banding, ranking) and
  * compare it against the Spark result.
  */
object OracleAux {
  def dump(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // per-PACK isolation: the builders run eagerly (collects inside), so
    // one broken pack must degrade its own queries' oracles, not abort
    // Verify before oracle_sql.json exists and zero the round
    val frames = Seq[(String, () => Map[String, org.apache.spark.sql.DataFrame])](
      "GtfsPack" -> (() => GtfsPack.oracleAux(spark)),
      "MonitorPack" -> (() => MonitorPack.oracleAux(spark)),
      "PipelinePack" -> (() => PipelinePack.oracleAux(spark, sfDir))
    ).flatMap { case (pack, build) =>
      try build()
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux builders of $pack failed: ${e.getMessage}")
        Map.empty[String, org.apache.spark.sql.DataFrame]
      }
    }
    // Sibling of outDir ("<outDir>_aux"), NOT a subdirectory: the driver
    // harness treats every outDir/* entry as a query result to compare.
    frames.foreach { case (name, df) =>
      try df.coalesce(1).write.mode("overwrite").parquet(s"${outDir}_aux/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux dump $name failed: ${e.getMessage}")
      }
    }
  }
}
