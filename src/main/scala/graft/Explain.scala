package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for representative queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_match_basic","q_group_accum","q_lookup_unwind","q_dedup_lsh","q_knn_brute")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
