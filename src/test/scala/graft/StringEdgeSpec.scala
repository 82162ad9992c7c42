package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.op.{Env, Pipeline}

/** Edge behaviors of the string operator family against the Mongo manual
  * (reference docs/aggregation_operators.md §String): code-point
  * semantics on multibyte text, null propagation through $concat, search
  * misses, and case folding.
  */
class StringEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  private def one(df: org.apache.spark.sql.DataFrame, pipe: String): Row =
    Pipeline.run(df, pipe, env).collect().head

  test("code-point ops count characters, not bytes") {
    val df = Seq(Tuple1("héllo wörld")).toDF("s")
    val out = one(df,
      """[{"$project":{
           "len":{"$strLenCP":"$s"},
           "sub":{"$substrCP":["$s",1,4]},
           "idx":{"$indexOfCP":["$s","wörld"]},
           "miss":{"$indexOfCP":["$s","zzz"]}}}]""")
    assert(out.getInt(0) == 11, "é/ö are one code point each")
    assert(out.getString(1) == "éllo")
    assert(out.getInt(2) == 6, "index is in code points")
    assert(out.getInt(3) == -1)
  }

  test("$concat propagates null; $strcasecmp folds case") {
    val df = Seq((Option("a"), Option.empty[String])).toDF("a", "b")
    val out = one(df,
      """[{"$project":{
           "cat":{"$concat":["$a","-","$b"]},
           "ok":{"$concat":["$a","-","x"]},
           "cmp0":{"$strcasecmp":["HELLO","hello"]},
           "cmpLt":{"$strcasecmp":["abc","ABD"]},
           "cmpGt":{"$strcasecmp":["B","a"]}}}]""")
    assert(out.isNullAt(0), "any null operand nulls $concat")
    assert(out.getString(1) == "a-x")
    assert(out.getInt(2) == 0)
    assert(out.getInt(3) == -1)
    assert(out.getInt(4) == 1)
  }

  test("$replaceOne replaces the first hit only; $replaceAll every hit") {
    val df = Seq(Tuple1("a.b.a.b")).toDF("s")
    val out = one(df,
      """[{"$project":{
           "once":{"$replaceOne":{"input":"$s","find":"a","replacement":"X"}},
           "all":{"$replaceAll":{"input":"$s","find":".","replacement":"-"}},
           "noHit":{"$replaceOne":{"input":"$s","find":"zz",
                                   "replacement":"X"}}}}]""")
    assert(out.getString(0) == "X.b.a.b")
    assert(out.getString(1) == "a-b-a-b", "find is literal, not regex")
    assert(out.getString(2) == "a.b.a.b", "no match returns the input")
  }

  test("$trim family honors the chars option per side") {
    val df = Seq(Tuple1("xxhixx")).toDF("s")
    val out = one(df,
      """[{"$project":{
           "both":{"$trim":{"input":"$s","chars":"x"}},
           "l":{"$ltrim":{"input":"$s","chars":"x"}},
           "r":{"$rtrim":{"input":"$s","chars":"x"}},
           "ws":{"$trim":{"input":"  hi\t"}}}}]""")
    assert(out.getString(0) == "hi")
    assert(out.getString(1) == "hixx")
    assert(out.getString(2) == "xxhi")
    assert(out.getString(3) == "hi", "default trims whitespace")
  }

  test("$regexFind surfaces match, code-point index, and captures") {
    val df = Seq(Tuple1("order 66 and order 99")).toDF("s")
    val out = one(df,
      """[{"$project":{
           "f":{"$regexFind":{"input":"$s","regex":"order (\\d+)"}},
           "all":{"$regexFindAll":{"input":"$s","regex":"(\\d+)"}},
           "none":{"$regexFind":{"input":"$s","regex":"zzz"}}}}]""")
    val f = out.getStruct(0)
    assert(f.getString(0) == "order 66")
    assert(f.getInt(1) == 0)
    assert(f.getSeq[String](2) == Seq("66"))
    assert(out.getSeq[Row](1).map(_.getString(0)) == Seq("66", "99"))
    assert(out.isNullAt(2), "no match is null, not an empty struct")
  }
}
