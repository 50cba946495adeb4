package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Audio-fingerprint Catalyst expressions.
  *
  *  - [[AudioEnvHash]] — 64-bit loudness-envelope hash of an audio
  *    payload (binary → nullable long). The kernel spec lives with the
  *    decoder ([[graft.operators.Multimodal.MediaCodec.audioEnvHash64]]):
  *    the real PCM / G.711 / IMA-ADPCM decode dispatch, 65 equal time
  *    segments, integer mean-absolute-amplitude per segment, one
  *    louder-than-next bit per adjacent segment pair. NULL is the
  *    refusal path (not decodable / fewer than 65 samples).
  *
  * Same codegen shape as [[ImageExpressions.DhashImage]]: the expression
  * participates in whole-stage codegen via a bound reference to itself —
  * the per-row work is the sample decode, which dwarfs dispatch cost,
  * but staying inside the generated loop avoids the UDF
  * serialization/row-conversion detour.
  */
object AudioExpressions {

  case class AudioEnvHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "audio_env_hash"
    // Pure, but declared nondeterministic so the optimizer cannot
    // substitute the decode-heavy call into both a pushed-down
    // isnotnull Filter AND the Project that names it — that rewrite
    // ran the PCM/G.711/ADPCM/AIFF decode twice per row (r20 PLANS.md
    // audit; see VideoExpressions.VideoSigHash for the full note).
    override lazy val deterministic: Boolean = false

    override def nullSafeEval(input: Any): Any =
      graft.operators.Multimodal.MediaCodec
        .audioEnvHash64(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("audioEnvHash", this, classOf[AudioEnvHash].getName)
      val tmp = ctx.freshName("aenv")
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

  /** Column wrapper: 64-bit envelope hash of a binary audio column
    * (null = refusal). */
  def audioEnvHash(c: Column): Column =
    GraftBridge.column(AudioEnvHash(GraftBridge.expr(c)))
}
