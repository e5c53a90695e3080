package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** `SparkSessionExtensions` entry point: registers the engine's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(text) ...")` works after
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`). This is the (c)-tier
  * integration path from the build guidance — used here for function
  * registration; planner strategies are intentionally absent because no
  * operator in the surface needs one (SURVEY §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private[graft] val registrations: Seq[(
      FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => Simhash64Expr(args.head)),
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args.head, if (args.size > 1) intArg(args(1), "n") else 3)),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
      (args: Seq[Expression]) =>
        MinHashSignatureExpr(args.head, intArg(args(1), "numHashes"))),
    (new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      (args: Seq[Expression]) => new LangIdExpr(args.head,
        graft.ops.TextAnalysis.LanguageMarkers.toSeq.sortBy(_._1), Set("zh"))),
    (new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "repetition_stats"),
      (args: Seq[Expression]) => RepetitionStatsExpr(args.head)),
    (new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNgramsExpr(
        args.head,
        if (args.size > 1) intArg(args(1), "n") else 3,
        distinct = args.size > 2 && (args(2) match {
          case Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"distinct must be a boolean literal, got $other")
        }))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimExpr(args.head, args(1))),
    (new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "lsh_bucket"),
      (args: Seq[Expression]) =>
        LshBucketExpr(args.head, intArg(args(1), "numPlanes"))),
    (new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinHashBandsExpr(args.head,
        intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"))))

  /** Register the same functions on an already-built session (the
    * extension path only applies at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
