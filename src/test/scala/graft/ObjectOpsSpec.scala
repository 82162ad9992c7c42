package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.op.{Env, Pipeline}

/** Object-family operators whose outputs (MapType) don't round-trip
  * through the parquet-based oracle: $arrayToObject, nested $project
  * inclusion, dotted $addFields/$unset.
  */
class ObjectOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  test("$arrayToObject from [[k,v]...] and from [{k,v}...]") {
    val df = Seq(Tuple1(1)).toDF("x")
    val out = Pipeline.run(df,
      """[{"$project":{
           "m1":{"$arrayToObject":{"$literal":[["a",1],["b",2]]}},
           "m2":{"$arrayToObject":[[{"k":"c","v":3}]]}}}]""", env)
      .collect().head
    // [["a",1]] has no common Spark element type → values coerce to string
    // (use the {k,v} struct form to keep value types)
    assert(out.getAs[Map[String, String]]("m1") ==
      Map("a" -> "1", "b" -> "2"))
    assert(out.getAs[Map[String, Long]]("m2") == Map("c" -> 3L))
  }

  test("$objectToArray/$arrayToObject round-trip") {
    val df = Seq((7L, 9L)).toDF("a", "b")
    val out = Pipeline.run(df,
      """[{"$project":{"m":{"$arrayToObject":[{"$objectToArray":{"x":"$a","y":"$b"}}]}}}]""",
      env).collect().head
    assert(out.getAs[Map[String, Long]]("m") == Map("x" -> 7L, "y" -> 9L))
  }

  test("nested $project inclusion keeps structure") {
    val df = Seq(("i1", "deep", 5)).toDF("_id", "tag", "n")
    val out = Pipeline.run(df,
      """[{"$addFields":{"sub":{"tag":"$tag","n":"$n"}}},
          {"$project":{"sub.tag":1}}]""", env).collect().head
    val sub = out.getAs[org.apache.spark.sql.Row]("sub")
    assert(sub.schema.fieldNames.toSeq == Seq("tag"))
    assert(sub.getString(0) == "deep")
    assert(out.getAs[String]("_id") == "i1") // _id kept by default
  }

  test("array $sort with paths orders objects by nested fields") {
    val df = Seq(Tuple1("x")).toDF("k")
      .withColumn("items", org.apache.spark.sql.functions.expr(
        """array(named_struct('p', 3, 'q', 'c'),
                 named_struct('p', 1, 'q', 'b'),
                 named_struct('p', 1, 'q', 'a'))"""))
    val out = Pipeline.run(df,
      """[{"$addFields":{"sorted":{"$sort":{"input":"$items",
                                            "paths":["p","q"]}}}}]""", env)
      .collect().head
    val sorted = out.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getInt(0), r.getString(1)))
    assert(sorted.toList == List((1, "a"), (1, "b"), (3, "c")))
  }

  test("query $elemMatch with a sub-query over array-of-struct fields") {
    val df = Seq(
      ("d1", Seq(("a", 1), ("b", 9))),
      ("d2", Seq(("a", 3))),
      ("d3", Seq[(String, Int)]()))
      .toDF("_id", "raw")
      .withColumn("items", org.apache.spark.sql.functions.expr(
        "transform(raw, x -> named_struct('name', x._1, 'qty', x._2))"))
      .drop("raw")
    val out = Pipeline.run(df,
      """[{"$match":{"items":{"$elemMatch":{"name":"a","qty":{"$gte":2}}}}}]""",
      env)
    assert(out.select("_id").collect().map(_.getString(0)).toSeq == Seq("d2"))
  }

  test("typed array fields: range and $in match any element (Mongo)") {
    val df = Seq(
      ("d1", Seq(1L, 5L, 9L)),
      ("d2", Seq(2L)),
      ("d3", Seq[Long]()))
      .toDF("_id", "nums")
    def run(m: String): Seq[String] = Pipeline.run(df,
      s"""[{"$$match":$m}]""", env)
      .select("_id").collect().map(_.getString(0)).toSeq.sorted
    // the scalar comparison would fail analysis against an array column;
    // Mongo matches when ANY element satisfies the operator
    assert(run("""{"nums":{"$gt":8}}""") == Seq("d1"))
    assert(run("""{"nums":{"$lte":2}}""") == Seq("d1", "d2"))
    assert(run("""{"nums":{"$in":[5,7]}}""") == Seq("d1"))
    assert(run("""{"nums":{"$nin":[5]}}""") == Seq("d2", "d3"))
  }

  test("$group with an object _id groups by multiple keys") {
    val df = Seq(("F", "O", 1), ("F", "O", 2), ("F", "N", 5), ("R", "O", 7))
      .toDF("f", "s", "q")
    val out = Pipeline.run(df,
      """[{"$group":{"_id":{"flag":"$f","status":"$s"},
                     "total":{"$sum":"$q"}}}]""", env)
      .collect()
      .map { r =>
        val id = r.getAs[org.apache.spark.sql.Row]("_id")
        ((id.getString(0), id.getString(1)), r.getAs[Long]("total"))
      }.toMap
    assert(out == Map(("F", "O") -> 3L, ("F", "N") -> 5L, ("R", "O") -> 7L))
  }

  test("$redact $$KEEP stops recursion and keeps the subtree") {
    val df = Seq(
      ("d1", "open", "secret-inner"),
      ("d2", "locked", "secret-inner"))
      .toDF("_id", "mode", "inner")
    val out = Pipeline.run(df,
      """[{"$addFields":{"sub":{"mode":"$mode","inner":"$inner"}}},
          {"$redact":{"$switch":{"branches":[
             {"case":{"$eq":["$mode","open"]},"then":"$$KEEP"},
             {"case":{"$eq":["$mode","locked"]},"then":"$$PRUNE"}],
             "default":"$$DESCEND"}}}]""", env).collect()
    // d2 pruned entirely; d1 kept whole including the nested subtree
    assert(out.length == 1)
    assert(out.head.getAs[String]("_id") == "d1")
    assert(out.head.getAs[org.apache.spark.sql.Row]("sub")
      .getAs[String]("inner") == "secret-inner")
  }

  test("$mergeObjects accumulator merges field-wise, ignoring nulls") {
    // each field is non-null in exactly one row → result is order-independent
    val df = Seq(
      ("g", Some(1), None: Option[String]),
      ("g", None: Option[Int], Some("x")))
      .toDF("k", "a", "b")
    val out = Pipeline.run(df,
      """[{"$addFields":{"o":{"a":"$a","b":"$b"}}},
          {"$group":{"_id":"$k","merged":{"$mergeObjects":"$o"}}}]""", env)
      .collect().head
    val merged = out.getAs[org.apache.spark.sql.Row]("merged")
    assert(merged.getAs[Int]("a") == 1)
    assert(merged.getAs[String]("b") == "x")
  }

  test("dotted $addFields and $unset update nested fields") {
    val df = Seq(("i1", 1, 2)).toDF("_id", "a", "b")
    val out = Pipeline.run(df,
      """[{"$addFields":{"sub":{"a":"$a","b":"$b"}}},
          {"$addFields":{"sub.c":{"$add":["$sub.a","$sub.b"]}}},
          {"$unset":"sub.a"}]""", env).collect().head
    val sub = out.getAs[org.apache.spark.sql.Row]("sub")
    assert(sub.schema.fieldNames.toSeq == Seq("b", "c"))
    assert(sub.getInt(1) == 3)
  }
}
