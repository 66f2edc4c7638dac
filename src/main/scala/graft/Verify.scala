package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDirArg) = args
    // oracle SQL references dumped parquet by ABSOLUTE path (__VOUT__ token)
    val outDir = new java.io.File(outDirArg).getAbsolutePath
    // shared session shape (GraftSession): correctness runs execute the
    // plans the bench times
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // aux oracle inputs (see graft.queries.OracleAux): dumped to a SIBLING
    // directory of outDir, not inside it — the driver harness scans every
    // outDir subdirectory as a query result, and the mixed-schema aux
    // parquet crashed its pandas sort (the r3 `_aux` error entry).
    // oracle_sql.json must be written even if the aux dump dies wholesale —
    // rows-only checks beat a round with no oracle file at all
    try graft.queries.OracleAux.dump(spark, sfDir, outDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] aux dump failed: ${e.getMessage}")
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__VOUT__/_aux", outDir + "_aux").replace("__VOUT__", outDir))}"
      }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
