package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.json.Js
import graft.op.{Env, Pipeline}

/** Round-8 review hardening of the typed stage compiler and runner:
  * dotted-path semantics, correlated $lookup honesty, streaming dedup
  * state bounds, and the stream-static join guard.
  */
class Round8HardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def run(pipeline: String,
      df: org.apache.spark.sql.DataFrame, env: Env = Env(spark)) =
    Pipeline.run(df, pipeline, env)

  test("$project merges dotted inclusions under one root") {
    val df = Seq(("x", 1, 2, 3)).toDF("_id", "b", "c", "d")
      .select(col("_id"), struct(col("b"), col("c"), col("d")).as("a"))
    val out = run("""[{"$project":{"a.b":1,"a.c":1}}]""", df)
    // ONE column named a, carrying both kept fields — two same-named
    // columns would be AMBIGUOUS_REFERENCE for any downstream stage
    assert(out.columns.count(_ == "a") == 1, out.columns.toSeq)
    val row = out.select(col("a.b"), col("a.c")).head()
    assert((row.getInt(0), row.getInt(1)) == (1, 2))
    assert(!out.select(to_json(struct(col("a")))).head().getString(0)
      .contains("\"d\""), "excluded field leaked")
  }

  test("$unwind on a dotted path replaces the nested field") {
    val df = Seq(("x", Seq(1, 2), "t")).toDF("_id", "items", "tag")
      .select(col("_id"), struct(col("items"), col("tag")).as("a"))
    val out = run("""[{"$unwind":"$a.items"}]""", df)
    assert(!out.columns.contains("a.items"),
      "literal top-level 'a.items' column minted")
    val rows = out.select(col("a.items"), col("a.tag"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "t"), (2, "t")), rows.toString)
  }

  test("correlated $lookup honors static predicates in the $match") {
    val orders = Seq((1L, "active", 10), (1L, "void", 99), (2L, "active", 20))
      .toDF("cust", "status", "amt")
    val env = Env(spark, collection = _ => orders)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val out = run(
      """[{"$lookup":{"from":"orders","let":{"cid":"$id"},
           "pipeline":[{"$match":{"cust":"$$cid","status":"active"}}],
           "as":"ords"}}]""", df, env)
    val byId = out.select(col("id"), col("ords"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).size).toMap
    // the void order must be filtered BEFORE the join, not silently kept
    assert(byId == Map(1L -> 1, 2L -> 1), byId.toString)
  }

  test("correlated $lookup applies row-local trailing stages, rejects others") {
    val orders = Seq((1L, 10), (2L, 20)).toDF("cust", "amt")
    val env = Env(spark, collection = _ => orders)
    val df = Seq((1L, "a")).toDF("id", "name")
    val out = run(
      """[{"$lookup":{"from":"orders","let":{"cid":"$id"},
           "pipeline":[{"$match":{"cust":"$$cid"}},
                       {"$project":{"cust":1,"amt":1,"_id":0}}],
           "as":"ords"}}]""", df, env)
    val ord = out.select(col("ords")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(ord.head.schema.fieldNames.toSet == Set("cust", "amt"),
      ord.toString)
    // a projection that drops the JOIN field must fail loudly up front
    val e0 = intercept[IllegalArgumentException] {
      run("""[{"$lookup":{"from":"orders","let":{"cid":"$id"},
               "pipeline":[{"$match":{"cust":"$$cid"}},
                           {"$project":{"amt":1}}],
               "as":"ords"}}]""", df, env).collect()
    }
    assert(e0.getMessage.contains("join field"), e0.getMessage)
    // a non-row-local trailing stage must fail LOUDLY, never be dropped
    val e = intercept[IllegalArgumentException] {
      run("""[{"$lookup":{"from":"orders","let":{"cid":"$id"},
               "pipeline":[{"$match":{"cust":"$$cid"}},
                           {"$group":{"_id":null,"n":{"$count":{}}}}],
               "as":"ords"}}]""", df, env).collect()
    }
    assert(e.getMessage.contains("row-local"), e.getMessage)
  }

  test("typed streaming $deduplicate plans stateful dedup, honors the TTL") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val df = in.toDF().toDF("k", "v")
    val out = graft.op.Stages.compile("$deduplicate",
      Js.parse("""{"expression":"$k","cacheWindow":60000}"""),
      Env(spark))(df)
    // plain dropDuplicates would grow state forever and ignore the TTL:
    // the plan must carry the transformWithState dedup operator
    val analyzed = out.queryExecution.analyzed
    assert(analyzed.collectFirst {
      case t: org.apache.spark.sql.catalyst.plans.logical.TransformWithState
        => t
    }.isDefined, analyzed.toString.take(800))
  }

  test("a stream-static join without a window needs no unbounded opt-in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val staticSide = Seq(("a", 1L)).toDF("sk", "sv")
    val tables = Map(
      "ev" -> in.toDF().toDF("k", "v"),
      "dim" -> staticSide)
    val io = new TestIo(tables)
    // static side re-reads per micro-batch, no join state — the guard
    // must not demand allowUnboundedJoinState here
    val streams = new graft.streaming.AppRunner(spark, io, Env(spark)).run(
      """{"application":"ss","version":"1.0","parts":[
           {"type":"join","name":"j",
            "left":{"fromTopic":"ev","on":"$k"},
            "right":{"fromTopic":"dim","on":"$sk"}}]}""")
    assert(streams.contains("j"))
  }

  test("merging streams with conflicting $delay bounds fails loudly") {
    val io = new TestIo(Map(
      "t1" -> Seq(("a", "{}")).toDF("key", "value"),
      "t2" -> Seq(("b", "{}")).toDF("key", "value")))
    val e = intercept[IllegalArgumentException] {
      new graft.streaming.AppRunner(spark, io, Env(spark)).run(
        """{"application":"md","version":"1.0","parts":[
             {"type":"stream","name":"a","fromTopic":"t1",
              "pipeline":[{"$delay":{"topic":"r1",
                "deliverAt":{"$toLong":1000},"lateness":1000,
                "deadLetterTopic":"dlq-a"}}]},
             {"type":"stream","name":"b","fromTopic":"t2",
              "pipeline":[{"$delay":{"topic":"r2",
                "deliverAt":{"$toLong":1000},"lateness":60000,
                "deadLetterTopic":"dlq-b"}}]},
             {"type":"merge","name":"m","fromStreams":["a","b"],
              "toTopic":"out"}]}""")
    }
    assert(e.getMessage.contains("disagree"), e.getMessage)
  }

  test("lag sampling admits one claim per interval under contention") {
    val id = "lag-atomic-" + System.nanoTime()
    import scala.jdk.CollectionConverters._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (1 to 32).map(_ => pool.submit(
        new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            graft.streaming.KafkaLag.sample(id, 60000, 1000L)
        })).map(_.get())
      assert(results.count(identity) == 1,
        s"${results.count(identity)} claims passed for one interval")
    } finally pool.shutdown()
  }
}
