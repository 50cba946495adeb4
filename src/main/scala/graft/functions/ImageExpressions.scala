package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Image-fingerprint Catalyst expressions.
  *
  *  - [[DhashImage]] — 64-bit perceptual difference hash of an image
  *    payload (binary → nullable long). The kernel spec lives with the
  *    decoder ([[graft.operators.Multimodal.MediaCodec.dhash64]]): real
  *    `javax.imageio` decode behind the positive container guard,
  *    integer BT.601 luminance, 9×8 area-average grid, one
  *    brighter-than-right bit per adjacent cell pair. NULL is the
  *    refusal path (not an image / decode failure / smaller than the
  *    grid).
  *
  * Same codegen shape as [[TextExpressions.DecodeMimeHeader]]: the
  * expression participates in whole-stage codegen via a bound reference
  * to itself — the per-row work is the ImageIO decode, which dwarfs any
  * dispatch cost, but staying inside the generated loop avoids the UDF
  * serialization/row-conversion detour.
  */
object ImageExpressions {

  case class DhashImage(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "dhash_image"
    // Pure, but declared nondeterministic so the optimizer cannot
    // substitute the decode-heavy call into both a pushed-down
    // isnotnull Filter AND the Project that names it — that rewrite
    // ran the ImageIO decode twice per row (r20 PLANS.md audit; see
    // VideoExpressions.VideoSigHash for the full note).
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(input: Any): Any =
      graft.operators.Multimodal.MediaCodec.dhash64(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dhashImage", this, classOf[DhashImage].getName)
      val tmp = ctx.freshName("dhash")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper: 64-bit dHash of a binary image column (null =
    * refusal). */
  def dhashImage(c: Column): Column =
    GraftBridge.column(DhashImage(GraftBridge.expr(c)))
}
