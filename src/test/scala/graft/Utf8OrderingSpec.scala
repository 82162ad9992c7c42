package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Fns

/** Driver-side string sorts must agree with engine/oracle binary
  * collation: Java's natural String order compares UTF-16 code units
  * and diverges from UTF-8 byte order on supplementary-plane
  * characters — exactly where [[Fns.utf8Ordering]] must not.
  */
class Utf8OrderingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // U+FFFD (BMP, UTF-16 unit 0xFFFD, UTF-8 EF BF BD) vs
  // U+1F600 (supplementary, UTF-16 lead 0xD83D, UTF-8 F0 9F 98 80):
  // natural Java order puts the emoji FIRST (0xD83D < 0xFFFD); UTF-8
  // byte order puts it LAST (F0 > EF).
  private val bmp = "�"
  private val emoji = new String(Character.toChars(0x1F600))

  test("utf8Ordering diverges from Java natural order exactly on non-BMP") {
    assert(emoji < bmp) // Java UTF-16 order
    assert(Fns.utf8Ordering.gt(emoji, bmp)) // UTF-8 byte order
    // ASCII and general BMP-only comparisons agree with natural order
    for ((a, b) <- Seq(("a", "b"), ("", "a"), ("abc", "abd"),
        ("z", "~"), ("é", "ê"), (bmp, "A"))) {
      assert(Fns.utf8Ordering.compare(a, b).sign ===
        a.compareTo(b).sign)
    }
  }

  test("driver-side vocabulary rank matches Spark's orderBy on non-BMP pieces") {
    val pieces = Seq(emoji, bmp, "a", "zz")
    val engineOrder = pieces.toDF("p").orderBy("p")
      .as[String].collect().toSeq
    assert(engineOrder === pieces.sorted(Fns.utf8Ordering))
    // and the natural sort would have gotten it wrong
    assert(engineOrder !== pieces.sorted)
  }
}
