package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Video-fingerprint Catalyst expressions.
  *
  *  - [[VideoSigHash]] — 64-bit perceptual clip signature of a video
  *    payload (binary → nullable long). The kernel spec lives with the
  *    decoder ([[graft.operators.Multimodal.MediaCodec.videoSigHash64]]):
  *    the real AVI `movi` frame walk, the image dHash kernel per frame,
  *    and a strict-majority vote per bit. NULL is the refusal path (no
  *    walkable frames / any frame the image kernel refuses).
  *
  * Same codegen shape as [[ImageExpressions.DhashImage]]: the expression
  * participates in whole-stage codegen via a bound reference to itself —
  * the per-row work is the frame walk + per-frame ImageIO decode, which
  * dwarfs any dispatch cost, but staying inside the generated loop
  * avoids the UDF serialization/row-conversion detour.
  */
object VideoExpressions {

  case class VideoSigHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "video_sig_hash"
    // The function is pure, but advertising that lets the optimizer
    // substitute it into every consumer: `select(sig as sim).filter
    // (isNotNull)` rewrites to Filter(isnotnull(sig(media))) BELOW a
    // Project(sig(media)) — the container walk + every frame decode
    // runs TWICE per row (seen in the r20 PLANS.md audit). Declaring it
    // nondeterministic pins evaluation to the one Project that names
    // it; results are unchanged (it IS deterministic), only the
    // duplicate-evaluation rewrites are disabled.
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(input: Any): Any =
      graft.operators.Multimodal.MediaCodec
        .videoSigHash64(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("videoSig", this, classOf[VideoSigHash].getName)
      val tmp = ctx.freshName("vsig")
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

  /** Column wrapper: 64-bit clip signature of a binary video column
    * (null = refusal). */
  def videoSigHash(c: Column): Column =
    GraftBridge.column(VideoSigHash(GraftBridge.expr(c)))

  /** [[VideoSigHash]]'s frame-SET sibling: DISTINCT per-frame dHashes
    * (binary → nullable array<long>), the clip view
    * [[graft.operators.Dedup.videoFrameContainment]] consumes for
    * subclip/trim detection. Same refusal contract and the same
    * nondeterministic declaration (see [[VideoSigHash]]'s note — the
    * per-frame decode must not be substituted into duplicate
    * evaluation sites). */
  case class VideoFrameHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "video_frame_hashes"
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(input: Any): Any = {
      val hs = graft.operators.Multimodal.MediaCodec
        .videoFrameHashes64(input.asInstanceOf[Array[Byte]])
      if (hs == null) null else new GenericArrayData(hs)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("videoFrames", this,
        classOf[VideoFrameHashes].getName)
      val tmp = ctx.freshName("vfh")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrapper: distinct per-frame dHashes of a binary video
    * column (null = refusal). */
  def videoFrameHashes(c: Column): Column =
    GraftBridge.column(VideoFrameHashes(GraftBridge.expr(c)))
}
