package graft.expr.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived feature hashing shared by the interpreted and generated
  * paths of [[HashedMarginInt]]: bucket = (first 32 md5 bits, unsigned)
  * mod buckets — exactly `Fns.h32(tok) % buckets` (the hex route the
  * training pass and the DuckDB oracle compute), just without building
  * the hex string.
  */
object HashedMarginUtil {
  private val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  def bucketOf(tok: UTF8String, buckets: Int): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % buckets).toInt
  }
}

/** Native classifier margin: Σ weights(bucket(token)) over the DISTINCT
  * hashed buckets of a token array, as one whole-stage-codegen
  * expression. The HOF formulation (`transform` + `array_distinct` +
  * `aggregate`) interprets every element — including the md5 — which
  * would make the corpus-sized scoring pass the classifier's hot spot.
  * The weight array is a FOLDABLE literal (the model is config-size
  * data); it is evaluated once and baked into the generated code as a
  * reference object, and the per-row dedup scratchpad is a reused
  * mutable `boolean[]`, so the loop allocates nothing. Bit-identical to
  * the exploded training aggregation: the margin is an integer sum over
  * a set, order-independent by construction.
  */
case class HashedMarginInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_margin"

  private lazy val weights: Array[Long] = {
    require(right.foldable,
      "hashed_margin: the weight array must be a literal")
    right.eval().asInstanceOf[ArrayData].toLongArray()
  }

  override def nullSafeEval(t: Any, w: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val ws = weights
    val seen = new Array[Boolean](ws.length)
    var s = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val b = HashedMarginUtil.bucketOf(toks.getUTF8String(i), ws.length)
        if (!seen(b)) { seen(b) = true; s += ws(b) }
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    val seen = ctx.addMutableState("boolean[]", "seen",
      v => s"$v = new boolean[${weights.length}];")
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      s"""
         |java.util.Arrays.fill($seen, false);
         |long $s = 0L;
         |int $n = $t.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$t.isNullAt($i)) {
         |    int $b = graft.expr.catalyst.HashedMarginUtil.bucketOf(
         |      $t.getUTF8String($i), ${weights.length});
         |    if (!$seen[$b]) { $seen[$b] = true; $s += $wRef[$b]; }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedMarginInt =
    copy(left = newLeft, right = newRight)
}
