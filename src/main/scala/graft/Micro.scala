package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: micro-timings of harness primitives (eager localCheckpoint,
  * counts, tiny shuffles) to separate per-job overhead from real work.
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"  $name%-55s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    val r1 = spark.range(1000).coalesce(1); r1.count()
    val r32 = spark.range(1000).repartition(32)
      .localCheckpoint(true)
    val r256 = spark.range(1000).repartition(256)
      .localCheckpoint(true)
    t("count 1-task")(r1.count())
    t("count 32-task ckpt")(r32.count())
    t("count 256-task ckpt")(r256.count())
    val rdd32 = r32.rdd.map(_ => 1L); rdd32.count()
    t("RDD count 32-task (no SQL planning)")(rdd32.count())
    val sh = spark.range(1000).select((col("id") % 7).as("k"))
      .groupBy("k").count()
    sh.count()
    t("SQL count with 32-part shuffle (AQE)")(sh.count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sh.count()
    t("SQL count with 32-part shuffle (AQE off)")(sh.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // RDD-level shuffle for comparison
    val kv = spark.sparkContext.parallelize(1 to 1000, 32)
      .map(i => (i % 7, 1L))
    kv.reduceByKey(_ + _).count()
    t("RDD reduceByKey 32-part")(kv.reduceByKey(_ + _).count())
    spark.stop(); System.exit(0)
  }
}
