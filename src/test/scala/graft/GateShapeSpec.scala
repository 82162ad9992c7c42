package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Verify-time gate-shape guard: a driver gate whose output carries
  * a top-level array/map/struct column is invisible to the hard
  * correctness signal (the driver's pandas sorter throws before
  * comparing — the r14 `*_encode_ids` lesson), so Verify must refuse
  * it loudly instead of dumping parquet the driver then errors on.
  */
class GateShapeSpec extends AnyFunSuite {

  test("scalar-only schemas pass") {
    val s = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("ok", BooleanType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(38, 0))))
    assert(Verify.gateShapeErrors(s).isEmpty)
  }

  test("top-level array, map and struct columns are flagged by name") {
    val s = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("piece_ids", ArrayType(LongType)),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType))))))
    assert(Verify.gateShapeErrors(s) ===
      Seq("piece_ids", "attrs", "nested"))
  }
}
