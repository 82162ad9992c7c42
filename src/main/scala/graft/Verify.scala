package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, MapType, StructField, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Gate-shape guard: the driver's checker sorts result rows with
    * pandas, which cannot sort a top-level array/map/struct column —
    * such a gate reports `err` (rows/schema/hash all null) and the
    * hard correctness signal goes blind to it (the r14 `*_encode_ids`
    * lesson). Fail HERE, loudly and per-query, instead: a gate must
    * project complex values to scalar rows (posexplode / array_join).
    */
  private[graft] def gateShapeErrors(schema: StructType): Seq[String] =
    schema.fields.collect {
      case StructField(name, _: ArrayType | _: MapType | _: StructType,
          _, _) => name
    }.toSeq
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local iteration aid: SPARK_GRAFT_ONLY=q_a,q_b runs a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // a query that throws must stay VISIBLE in the artifacts, not just on
    // stderr: a harness that keys off the parquet dirs would otherwise
    // silently shrink the checked set (exactly what happened when the
    // testdata's timestamp type changed under four event-time queries)
    var failures = Map.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val complex = gateShapeErrors(df.schema)
        require(complex.isEmpty,
          s"gate-shape: top-level complex column(s) " +
            s"${complex.mkString(", ")} — the driver's checker cannot " +
            "sort them; project to scalar rows (posexplode/array_join)")
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> s"${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(3)
            .mkString(" ")}"
      }
      // the parquet dump is written — release this query's ml-internal
      // pins (band tables, signatures, codebooks) instead of letting ~150
      // queries' caches pile onto the storage pool. Bench does the same
      // before each timed attempt (since round 13), for the same
      // isolation reason.
      graft.ml.CacheLifecycle.releaseAll()
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json: every attempted-but-failed query with a one-line cause.
    // Always written (empty object when clean) so "file absent" and
    // "nothing failed" are distinguishable.
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
    // summary on stderr, exit 0 either way: the per-query dumps that DID
    // succeed must still reach the comparing harness — a nonzero exit
    // could make it discard the whole run over one bad query
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} queries FAILED: ${
          failures.keys.toSeq.sorted.mkString(",")}")
  }
}
