package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.op.{Env, Pipeline}

/** MongoDB-documented edge behaviors of the array/set operator family
  * (reference docs/aggregation_operators.md links each operator straight
  * to the MongoDB manual): negative/out-of-range indexes, empty-set
  * identities, $zip padding, $arrayToObject duplicate keys, $reduce over
  * the empty array.
  */
class ExprEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  private def one(df: org.apache.spark.sql.DataFrame, pipe: String): Row =
    Pipeline.run(df, pipe, env).collect().head

  private val arr = Seq(Tuple1(Seq(10L, 20L, 30L))).toDF("a")

  test("$arrayElemAt: negative wraps from the end, out-of-range is null") {
    val out = one(arr,
      """[{"$project":{
           "last":{"$arrayElemAt":["$a",-1]},
           "first":{"$arrayElemAt":["$a",0]},
           "over":{"$arrayElemAt":["$a",9]},
           "under":{"$arrayElemAt":["$a",-9]}}}]""")
    assert(out.getLong(0) == 30L)
    assert(out.getLong(1) == 10L)
    assert(out.isNullAt(2), "index past the end must be missing/null")
    assert(out.isNullAt(3), "negative index past the start must be null")
  }

  test("$slice: negative count takes from the end, position clamps") {
    val out = one(arr,
      """[{"$project":{
           "firstTwo":{"$slice":["$a",2]},
           "lastTwo":{"$slice":["$a",-2]},
           "midOne":{"$slice":["$a",1,1]},
           "negPos":{"$slice":["$a",-2,1]},
           "overPos":{"$slice":["$a",10,2]}}}]""")
    assert(out.getSeq[Long](0) == Seq(10L, 20L))
    assert(out.getSeq[Long](1) == Seq(20L, 30L))
    assert(out.getSeq[Long](2) == Seq(20L))
    assert(out.getSeq[Long](3) == Seq(20L))
    assert(out.getSeq[Long](4) == Seq.empty,
      "position past the end yields an empty array")
  }

  test("$indexOfArray: found/not-found/range, null array is null") {
    val df = Seq((Seq(1L, 2L, 3L, 2L), Option.empty[Seq[Long]]))
      .toDF("a", "nullArr")
    val out = one(df,
      """[{"$project":{
           "hit":{"$indexOfArray":["$a",2]},
           "miss":{"$indexOfArray":["$a",9]},
           "fromTwo":{"$indexOfArray":["$a",2,2]},
           "bounded":{"$indexOfArray":["$a",2,0,1]},
           "nulCol":{"$indexOfArray":["$nullArr",2]},
           "nulLit":{"$indexOfArray":[{"$literal":null},2]}}}]""")
    assert(out.getLong(0) == 1L)
    assert(out.getLong(1) == -1L)
    assert(out.getLong(2) == 3L, "start offset skips earlier hits")
    assert(out.getLong(3) == -1L, "end bound excludes the hit at 1")
    assert(out.isNullAt(4), "null array column yields null, not -1")
    assert(out.isNullAt(5), "literal null array yields null, not an error")
  }

  test("$zip: shortest by default, longestLength pads with defaults") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(10L, 20L))).toDF("x", "y")
    val out = one(df,
      """[{"$project":{
           "short":{"$zip":{"inputs":["$x","$y"]}},
           "long":{"$zip":{"inputs":["$x","$y"],"useLongestLength":true}},
           "defs":{"$zip":{"inputs":["$x","$y"],"useLongestLength":true,
                           "defaults":[0,-1]}}}}]""")
    assert(out.getSeq[scala.collection.Seq[Any]](0).map(_.toSeq) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L)),
      "default zips to the SHORTEST input")
    assert(out.getSeq[scala.collection.Seq[Any]](1).map(_.toSeq) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, null)),
      "longestLength pads the short input with null")
    assert(out.getSeq[scala.collection.Seq[Any]](2).map(_.toSeq) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, -1L)),
      "defaults pad per input position")
  }

  test("$zip: any null/missing input makes the result null") {
    val df = Seq((Seq(1L, 2L), Option.empty[Seq[Long]])).toDF("x", "n")
    val out = one(df,
      """[{"$project":{
           "nulCol":{"$zip":{"inputs":["$x","$n"]}},
           "nulLit":{"$zip":{"inputs":["$x",{"$literal":null}]}},
           "nulLong":{"$zip":{"inputs":["$n","$x"],
                              "useLongestLength":true}}}}]""")
    (0 to 2).foreach(i => assert(out.isNullAt(i),
      s"slot $i: a null input must null the whole $$zip result, " +
        "never act as an empty array"))
  }

  test("$zip: malformed specs error at compile, like Mongo") {
    val df = Seq((Seq(1L), Seq(2L))).toDF("x", "y")
    val noLongest = intercept[IllegalArgumentException] {
      one(df, """[{"$project":{"z":{"$zip":{"inputs":["$x","$y"],
                   "defaults":[0,0]}}}}]""")
    }
    assert(noLongest.getMessage.contains("useLongestLength"))
    val shortDefaults = intercept[IllegalArgumentException] {
      one(df, """[{"$project":{"z":{"$zip":{"inputs":["$x","$y"],
                   "useLongestLength":true,"defaults":[0]}}}}]""")
    }
    assert(shortDefaults.getMessage.contains("one entry per input"))
  }

  test("$in: Mongo equality on nulls, never SQL three-valued logic") {
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(1L, 2L)))
      .toDF("withNull", "plain")
    val out = one(df,
      """[{"$project":{
           "hit":{"$in":[1,"$plain"]},
           "miss":{"$in":[9,"$plain"]},
           "missWithNull":{"$in":[9,"$withNull"]},
           "nullHit":{"$in":[{"$literal":null},"$withNull"]},
           "nullMiss":{"$in":[{"$literal":null},"$plain"]}}}]""")
    assert(out.getBoolean(0))
    assert(!out.getBoolean(1))
    assert(!out.getBoolean(2),
      "a needle absent from an array CONTAINING nulls is false, not null")
    assert(out.getBoolean(3), "a null needle matches a null element")
    assert(!out.getBoolean(4), "a null needle misses a null-free array")
  }

  test("$concatArrays/$reverseArray/$map/$filter: null input yields null") {
    val df = Seq((Seq(1L, 2L), Option.empty[Seq[Long]])).toDF("a", "n")
    val out = one(df,
      """[{"$project":{
           "cc":{"$concatArrays":["$a","$n"]},
           "rev":{"$reverseArray":"$n"},
           "mapped":{"$map":{"input":"$n","in":{"$add":["$$this",1]}}},
           "filtered":{"$filter":{"input":"$n","cond":true}},
           "mapDefaultAs":{"$map":{"input":"$a",
                                   "in":{"$add":["$$this",10]}}}}}]""")
    (0 to 3).foreach(i => assert(out.isNullAt(i),
      s"slot $i must be null when any array input is null"))
    assert(out.getSeq[Long](4) == Seq(11L, 12L),
      "$map/$filter bind $$this when 'as' is omitted")
  }

  test("$first/$last: empty arrays and null input answer null") {
    val df = Seq((Seq(7L, 8L), Seq.empty[Long], Option.empty[Seq[Long]]))
      .toDF("a", "e", "n")
    val out = one(df,
      """[{"$project":{
           "f":{"$first":"$a"}, "l":{"$last":"$a"},
           "fe":{"$first":"$e"}, "le":{"$last":"$e"},
           "fn":{"$first":"$n"}, "ln":{"$last":"$n"}}}]""")
    assert(out.getLong(0) == 7L && out.getLong(1) == 8L)
    (2 to 5).foreach(i => assert(out.isNullAt(i)))
  }

  test("$objectToArray: null object yields null, not schema keys") {
    val df = Seq((1L, Some((1L, "x")), Option.empty[(Long, String)]))
      .toDF("id", "o", "n")
    val out = one(df,
      """[{"$project":{
           "ok":{"$objectToArray":"$o"},
           "nul":{"$objectToArray":"$n"},
           "lit":{"$objectToArray":{"$literal":null}}}}]""")
    assert(out.getSeq[Row](0).map(r => (r.getString(0))) == Seq("_1", "_2"))
    assert(out.isNullAt(1),
      "a null struct row must yield null, not [{k,_1,v:null}...]")
    assert(out.isNullAt(2))
  }

  test("typed model rejects heterogeneous array literals loudly") {
    // Spark's array() would silently coerce [1, "b"] to ["1", "b"] —
    // data corruption; the typed model has no element type for a mixed
    // literal, so it must refuse (the schemaless path represents it)
    val df = Seq(Tuple1(1L)).toDF("x")
    val e = intercept[IllegalArgumentException] {
      one(df, """[{"$project":{"z":{"$literal":[1,"b"]}}}]""")
    }
    assert(e.getMessage.contains("mixes Mongo type brackets"))
    val e2 = intercept[IllegalArgumentException] {
      one(df, """[{"$project":{"z":{"$in":[1,[1,"b"]]}}}]""")
    }
    assert(e2.getMessage.contains("mixes Mongo type brackets"))
  }

  test("$arrayToObject: later duplicate keys win") {
    val df = Seq(Tuple1(1)).toDF("x")
    val out = one(df,
      """[{"$project":{"o":{"$arrayToObject":{"$literal":
           [{"k":"a","v":1},{"k":"b","v":2},{"k":"a","v":9}]}}}}]""")
    val o = out.getAs[Map[String, Long]]("o")
    assert(o == Map("a" -> 9L, "b" -> 2L))
  }

  test("$reduce: empty input yields initialValue, null input yields null") {
    val df = Seq((Seq.empty[Long], Option.empty[Seq[Long]])).toDF("e", "n")
    val out = one(df,
      """[{"$project":{
           "empty":{"$reduce":{"input":"$e","initialValue":42,
             "in":{"$add":["$$value","$$this"]}}},
           "nul":{"$reduce":{"input":"$n","initialValue":42,
             "in":{"$add":["$$value","$$this"]}}}}}]""")
    assert(out.getLong(0) == 42L)
    assert(out.isNullAt(1), "$reduce over null is null, not initialValue")
  }

  test("set identities: empty-set edges follow the Mongo manual") {
    val df = Seq(Tuple1(1)).toDF("x")
    val out = one(df,
      """[{"$project":{
           "allEmpty":{"$allElementsTrue":[{"$literal":[]}]},
           "anyEmpty":{"$anyElementTrue":[{"$literal":[]}]},
           "emptySubset":{"$setIsSubset":[{"$literal":[]},
                                          {"$literal":[1]}]},
           "diffDedup":{"$setDifference":[{"$literal":[1,1,2]},
                                          {"$literal":[2]}]}}}]""")
    assert(out.getBoolean(0), "$allElementsTrue([]) is true (vacuous)")
    assert(!out.getBoolean(1), "$anyElementTrue([]) is false")
    assert(out.getBoolean(2), "the empty set is a subset of anything")
    assert(out.getSeq[Long](3) == Seq(1L),
      "$setDifference deduplicates its result")
  }

  test("$first/$last array accessors and $in element test") {
    val out = one(arr,
      """[{"$project":{
           "f":{"$first":"$a"},
           "l":{"$last":"$a"},
           "has":{"$in":[20,"$a"]},
           "hasNot":{"$in":[99,"$a"]}}}]""")
    assert(out.getLong(0) == 10L)
    assert(out.getLong(1) == 30L)
    assert(out.getBoolean(2))
    assert(!out.getBoolean(3))
  }
}
