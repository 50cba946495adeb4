package graft.functions

/** SQL-facing registration for the media fingerprint kernels — the
  * [[VectorExpressions.register]] pattern for the image/audio/video
  * family, so the perceptual-dedup building blocks are usable straight
  * from `spark.sql` over any binary column:
  *
  * {{{
  *   SELECT doc_id, dhash_image(media)       FROM images
  *   SELECT doc_id, audio_env_hash(media)    FROM clips
  *   SELECT doc_id, video_sig_hash(media)    FROM reels
  *   SELECT explode(video_frame_hashes(media)) FROM reels
  * }}}
  *
  * Each name maps to the codegen expression the batch operators and
  * streaming intakes use ([[ImageExpressions.DhashImage]],
  * [[AudioExpressions.AudioEnvHash]], [[VideoExpressions.VideoSigHash]],
  * [[VideoExpressions.VideoFrameHashes]]) — NULL is the refusal path in
  * all four. Idempotent per session. */
object MediaExpressions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    def once(name: String)(body: => Unit): Unit =
      if (!reg.functionExists(FunctionIdentifier(name))) body
    // arity validated like Spark's builtins: SELECT dhash_image() must
    // raise a named error, not a bare NoSuchElementException, and extra
    // arguments must not be silently ignored
    def one(name: String,
            exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : org.apache.spark.sql.catalyst.expressions.Expression = {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"Invalid number of arguments for function $name: " +
          s"expected 1, got ${exprs.length}")
      exprs.head
    }
    once("dhash_image") {
      reg.createOrReplaceTempFunction("dhash_image",
        exprs => ImageExpressions.DhashImage(one("dhash_image", exprs)),
        "scala_udf")
    }
    once("audio_env_hash") {
      reg.createOrReplaceTempFunction("audio_env_hash",
        exprs => AudioExpressions.AudioEnvHash(one("audio_env_hash", exprs)),
        "scala_udf")
    }
    once("video_sig_hash") {
      reg.createOrReplaceTempFunction("video_sig_hash",
        exprs => VideoExpressions.VideoSigHash(one("video_sig_hash", exprs)),
        "scala_udf")
    }
    once("video_frame_hashes") {
      reg.createOrReplaceTempFunction("video_frame_hashes",
        exprs => VideoExpressions.VideoFrameHashes(one("video_frame_hashes", exprs)),
        "scala_udf")
    }
  }
}
