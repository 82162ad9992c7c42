package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.op.Env
import graft.streaming.{AppRunner, GoldenTest, KafkaIo}

/** CLI in the shape of the reference's commands (docs/cli.md):
  *
  *   run  -f app.yaml --kafka host:9092 [--config k=v ...]   run against Kafka
  *   test -f appDir [--strict]                               golden-folder test
  */
object Run {

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("help")
    val opts = parseOpts(args.drop(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.caseSensitive", "true")
      // Mongo map semantics: a later duplicate key wins
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.catalyst.GraftFunctions.register(spark)

    cmd match {
      case "test" =>
        val dir = opts("f")
        val results =
          GoldenTest.run(spark, dir, strict = opts.contains("strict"),
            config = configOf(opts))
        results.foreach(r =>
          println(s"${if (r.ok) "PASS" else "FAIL"} ${r.topic}: ${r.detail}"))
        if (results.exists(!_.ok)) sys.exit(1)

      case "run" =>
        val appFile = opts("f")
        val appDir = Paths.get(appFile).toAbsolutePath.getParent
        val kafka = new KafkaIo(opts.getOrElse("kafka", "localhost:9092"))
        // --collections <dir>: file-backed collections (upsert parquet);
        // without it, collection edges fail fast
        val collIo = opts.get("collections")
          .map(root => new graft.streaming.ParquetCollectionIo(
            spark, root, kafka))
        val io: graft.streaming.Io = collIo.getOrElse(kafka)
        // stage-level sink ids: stable (derived from the target name) and
        // unique (occurrence counter — two $out stages to one target get
        // distinct checkpoint dirs; compile order within one app file is
        // deterministic)
        val stageSeq = new java.util.concurrent.ConcurrentHashMap[
          String, java.util.concurrent.atomic.AtomicInteger]()
        def stageId(name: String): String = {
          val n = stageSeq.computeIfAbsent(name,
            _ => new java.util.concurrent.atomic.AtomicInteger)
            .incrementAndGet()
          s"stage-$name-$n"
        }
        val env = Env(spark,
          collection = name => io.source(spark, "collection", name),
          // $probe's counts go to a TOPIC; $merge/$out write COLLECTIONS
          // (reference docs/aggregation_stages.md:378-392)
          sink = (topic, df) =>
            io.sink("topic", topic, df, asString = false, stageId(topic)),
          collectionSink = (coll, df) =>
            io.sink("collection", coll, df, asString = false, stageId(coll)),
          delete = (coll, matches, on) =>
            collIo match {
              case Some(c) => c.delete(coll, matches, on)
              case None => throw new IllegalArgumentException(
                "$delete needs --collections")
            },
          lag = graft.streaming.KafkaLag.provider(
            opts.getOrElse("kafka", "localhost:9092")),
          scripts = name => Files.readString(appDir.resolve(name)))
        new AppRunner(spark, io, env, configOf(opts))
          .run(Files.readString(Paths.get(appFile)))
        spark.streams.awaitAnyTermination()

      case other =>
        System.err.println(
          s"""usage: run -f app.yaml [--kafka host:port] [--config k=v ...]
             |       test -f appDir [--strict]""".stripMargin)
        sys.exit(if (other == "help") 0 else 2)
    }
    spark.stop()
  }

  private def parseOpts(args: Array[String]): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i).stripPrefix("--").stripPrefix("-")
      if (a == "strict") { out(a) = "true"; i += 1 }
      else if (a == "config") {
        val kv = args(i + 1).split("=", 2)
        out(s"config:${kv(0)}") = kv(1); i += 2
      } else { out(a) = args(i + 1); i += 2 }
    }
    out.toMap
  }

  private def configOf(opts: Map[String, String]): Map[String, String] =
    opts.collect { case (k, v) if k.startsWith("config:") =>
      k.stripPrefix("config:") -> v
    }
}
