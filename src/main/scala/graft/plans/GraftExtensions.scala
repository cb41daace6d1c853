package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension registration.
  *
  * Two entry points for the same registry:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (cluster deployment path);
  *  - `GraftExtensions.register(spark)` on a live session (library path).
  *
  * After either, `graft_simhash64(text)` is available to SQL and to
  * `call_function` from the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64 takes exactly one argument")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly two arguments")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles takes (text, k)")
        WordShingles(args.head, args(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_minhash takes (text, k, numHashes)")
        MinHashSig(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDist].getName, "graft_hamming"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hamming takes exactly two arguments")
        HammingDist(args.head, args(1))
      }),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc takes exactly one argument")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFps].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_winnow takes (text, k, w)")
        WinnowFps(args.head, args(1), args(2))
      }),
    (FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_deflate_len takes exactly one argument")
        DeflateLen(args.head)
      }),
    (FunctionIdentifier("graft_unmojibake"),
      new ExpressionInfo(classOf[MojibakeRepair].getName, "graft_unmojibake"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_unmojibake takes exactly one argument")
        MojibakeRepair(args.head)
      }),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bloom_contains takes (key, bloomBytes)")
        BloomMightContain(args.head, args(1))
      }),
    (FunctionIdentifier("graft_image_meta"),
      new ExpressionInfo(classOf[ImageMeta].getName, "graft_image_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_image_meta takes exactly one argument")
        ImageMeta(args.head)
      }),
    (FunctionIdentifier("graft_audio_meta"),
      new ExpressionInfo(classOf[AudioMeta].getName, "graft_audio_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_audio_meta takes exactly one argument")
        AudioMeta(args.head)
      }),
    (FunctionIdentifier("graft_video_meta"),
      new ExpressionInfo(classOf[VideoMeta].getName, "graft_video_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_video_meta takes exactly one argument")
        VideoMeta(args.head)
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jaro_winkler takes exactly two arguments")
        JaroWinkler(args.head, args(1))
      }),
    (FunctionIdentifier("graft_md5_fold48"),
      new ExpressionInfo(classOf[Md5Fold48].getName, "graft_md5_fold48"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5_fold48 takes exactly one argument")
        Md5Fold48(args.head)
      }),
    (FunctionIdentifier("graft_minhash_w"),
      new ExpressionInfo(classOf[WeightedMinHashSig].getName, "graft_minhash_w"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "graft_minhash_w takes (text, k, numHashes, tfCap)")
        WeightedMinHashSig(args.head, args(1), args(2), args(3))
      }),
    (FunctionIdentifier("graft_tf_bucket"),
      new ExpressionInfo(classOf[TfBucket].getName, "graft_tf_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_tf_bucket takes exactly two arguments")
        TfBucket(args.head, args(1))
      }))

  /** Register the graft function set on an already-built session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    org.apache.spark.sql.graft.Internal.injectStrategy(spark, TopKPerKeyStrategy)
    org.apache.spark.sql.graft.Internal.injectOptimization(spark, TopKRewriteRule)
  }
}
