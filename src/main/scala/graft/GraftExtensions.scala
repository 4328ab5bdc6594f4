package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BpeCountExpr, BpeCountWithExpr, BpeTokensExpr, CleanNumericExpr, CodepointsExpr, DotProductExpr, Md5LongExpr, Md5LongNgramsExpr, MergePairExpr, MessyNumericExpr, NormTextExpr, PqAdcExpr, PqEncodeExpr, RollingHashExpr, RollingHashRevExpr, RpLshKeysExpr, ShingleHashExpr, SigAgreeExpr, SparseDotExpr, SplitWordsExpr, TokenHitsExpr, TokenPairsExpr}

/** Engine extensions registered through the public
  * SparkSessionExtensions API (SURVEY.md §3): custom Catalyst
  * expressions become SQL-callable functions, resolvable from both the
  * Column API (functions.call_function) and spark.sql text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native as-of join (logical node ->
    // strategy -> sort-merge physical plan), graft.plans.AsOfJoin
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // governance: strip BROADCAST hints from join sides whose size
    // estimate exceeds spark.graft.broadcastGuard.maxBytes
    ext.injectOptimizerRule(session => graft.plans.BroadcastGuard(session))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"rolling_hash expects exactly 1 argument, got ${children.length}")
        RollingHashExpr(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("messy_numeric"),
      new ExpressionInfo(classOf[MessyNumericExpr].getName, "messy_numeric"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"messy_numeric expects exactly 2 arguments, got ${children.length}")
        MessyNumericExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("clean_numeric"),
      new ExpressionInfo(classOf[CleanNumericExpr].getName, "clean_numeric"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"clean_numeric expects exactly 1 argument, got ${children.length}")
        CleanNumericExpr(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"vec_dot expects exactly 2 arguments, got ${children.length}")
        DotProductExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_sub"),
      new ExpressionInfo(classOf[graft.functions.VecSubExpr].getName, "vec_sub"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"vec_sub expects exactly 2 arguments, got ${children.length}")
        graft.functions.VecSubExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("sparse_dot"),
      new ExpressionInfo(classOf[SparseDotExpr].getName, "sparse_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"sparse_dot expects exactly 2 arguments, got ${children.length}")
        SparseDotExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("rp_lsh_keys"),
      new ExpressionInfo(classOf[RpLshKeysExpr].getName, "rp_lsh_keys"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          s"rp_lsh_keys expects exactly 4 arguments, got ${children.length}")
        RpLshKeysExpr(children(0), children(1), children(2), children(3))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5LongExpr].getName, "md5_long"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"md5_long expects exactly 1 argument, got ${children.length}")
        Md5LongExpr(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("md5_long_ngrams"),
      new ExpressionInfo(classOf[Md5LongNgramsExpr].getName, "md5_long_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"md5_long_ngrams expects exactly 2 arguments, got ${children.length}")
        Md5LongNgramsExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHashExpr].getName, "shingle_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"shingle_hash expects exactly 2 arguments, got ${children.length}")
        ShingleHashExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("norm_text"),
      new ExpressionInfo(classOf[NormTextExpr].getName, "norm_text"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"norm_text expects exactly 1 argument, got ${children.length}")
        NormTextExpr(children.head)
      }
    ))
    // BPE family (SURVEY §2.3 T42/T43): bpe_count/bpe_tokens apply the
    // frozen merges table; codepoints/token_pairs are the trainer's
    // native per-word primitives
    Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression, Class[_])](
      ("bpe_count", cs => BpeCountExpr(cs.head), classOf[BpeCountExpr]),
      ("bpe_tokens", cs => BpeTokensExpr(cs.head), classOf[BpeTokensExpr]),
      ("codepoints", cs => CodepointsExpr(cs.head), classOf[CodepointsExpr]),
      ("token_pairs", cs => TokenPairsExpr(cs.head), classOf[TokenPairsExpr])
    ).foreach { case (name, build, cls) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(children.length == 1,
            s"$name expects exactly 1 argument, got ${children.length}")
          build(children)
        }
      ))
    }
    // fact-scan fusions flagged by InterpretedGuardSpec (r15)
    ext.injectFunction((
      new FunctionIdentifier("token_hits"),
      new ExpressionInfo(classOf[TokenHitsExpr].getName, "token_hits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"token_hits expects exactly 2 arguments, got ${children.length}")
        TokenHitsExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("split_words"),
      new ExpressionInfo(classOf[SplitWordsExpr].getName, "split_words"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"split_words expects exactly 1 argument, got ${children.length}")
        SplitWordsExpr(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("bpe_word_counts"),
      new ExpressionInfo(classOf[graft.functions.BpeWordCountsExpr].getName, "bpe_word_counts"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"bpe_word_counts expects exactly 1 argument, got ${children.length}")
        graft.functions.BpeWordCountsExpr(children.head)
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("window_sums"),
      new ExpressionInfo(classOf[graft.functions.WindowSumsExpr].getName, "window_sums"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"window_sums expects exactly 3 arguments, got ${children.length}")
        graft.functions.WindowSumsExpr(children(0), children(1), children(2))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("sig_agree"),
      new ExpressionInfo(classOf[SigAgreeExpr].getName, "sig_agree"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"sig_agree expects exactly 2 arguments, got ${children.length}")
        SigAgreeExpr(children(0), children(1))
      }
    ))
    // PQ codec (SURVEY §2.3 T47, q145): trained codebook folded once
    // at plan time; encode + asymmetric-distance scan stay codegen'd
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"pq_encode expects exactly 3 arguments, got ${children.length}")
        PqEncodeExpr(children(0), children(1), children(2))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[graft.functions.PqLutExpr].getName, "pq_lut"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"pq_lut expects exactly 3 arguments, got ${children.length}")
        graft.functions.PqLutExpr(children(0), children(1), children(2))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "pq_adc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"pq_adc expects exactly 3 arguments, got ${children.length}")
        PqAdcExpr(children(0), children(1), children(2))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("bpe_count_with"),
      new ExpressionInfo(classOf[BpeCountWithExpr].getName, "bpe_count_with"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"bpe_count_with expects exactly 2 arguments, got ${children.length}")
        BpeCountWithExpr(children(0), children(1))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("merge_pair"),
      new ExpressionInfo(classOf[MergePairExpr].getName, "merge_pair"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"merge_pair expects exactly 3 arguments, got ${children.length}")
        MergePairExpr(children(0), children(1), children(2))
      }
    ))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash_rev"),
      new ExpressionInfo(classOf[RollingHashRevExpr].getName, "rolling_hash_rev"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"rolling_hash_rev expects exactly 1 argument, got ${children.length}")
        RollingHashRevExpr(children.head)
      }
    ))
  }
}
