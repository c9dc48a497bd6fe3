package graft

import graft.functions.{BitmapAgg, BitmapCount, BitmapOverlap, BitmapUnionCountAgg, CosineSimilarity, DotProduct, FreqSketchAgg, HilbertIndex, KmvAgg, MinHashAgg, TopKAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point (SURVEY.md §3): custom Catalyst expressions
  * registered into the session's FunctionRegistry, plus the
  * [[graft.plans.StripScaledBroadcastHints]] optimizer rule (the
  * forced-broadcast safety net). Activate with
  * .withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(s => new graft.plans.StripScaledBroadcastHints(s))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HilbertIndex(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("minhash128"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash128"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_by_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKAgg(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvAgg(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bitset_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "bitset_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitmapAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bitset_union_count"),
      new ExpressionInfo(classOf[BitmapUnionCountAgg].getName, "bitset_union_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitmapUnionCountAgg(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bitset_count"),
      new ExpressionInfo(classOf[BitmapCount].getName, "bitset_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitmapCount(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bitset_overlap"),
      new ExpressionInfo(classOf[BitmapOverlap].getName, "bitset_overlap"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitmapOverlap(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketchAgg].getName, "freq_sketch"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FreqSketchAgg(children(0), children(1))))
    // Spark ships codegen'd Bloom expressions for its own runtime join
    // filtering but does not register them as SQL functions; exposing
    // them powers the DedupOps.BloomAdmission prefilter (100 TB dedup
    // admission without a full exact anti-join on every batch).
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
  }
}
