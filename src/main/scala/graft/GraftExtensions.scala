package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

import graft.functions.{BloomFilterAgg, BloomMightContain, CosineSimilarity, HyperplaneBands, KmvDistinctAgg, KmvMergeAgg, KmvSketchAgg, MinhashBands, NearestCentroid, PqAdcScore, PqAdcSum, PqLut, VectorSumAgg}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`
  * or `builder.withExtensions(new GraftExtensions)`): registers the
  * custom Catalyst functions so they are addressable from SQL text and
  * `expr(...)` exactly like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_sum"),
      VectorSumAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorSumAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      CosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bands"),
      HyperplaneBands.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"hyperplane_bands(vec, bands, rowsPerBand) takes 3 arguments, got ${children.length}")
        def lit(i: Int): Int = children(i) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"hyperplane_bands: bands/rowsPerBand must be non-null literals, got $e")
        }
        HyperplaneBands(children.head, lit(1), lit(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      KmvDistinctAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"kmv_distinct(col, k) takes 2 arguments, got ${children.length}")
        val k = children(1) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"kmv_distinct: k must be a non-null literal, got $e")
        }
        KmvDistinctAgg(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid"),
      NearestCentroid.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"nearest_centroid(v, centroids) takes 2 arguments, got ${children.length}")
        val m = children(1) match {
          case e if e.foldable && e.eval() != null =>
            val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            IndexedSeq.tabulate(ad.numElements()) { i =>
              val row = ad.getArray(i)
              IndexedSeq.tabulate(row.numElements())(row.getDouble)
            }
          case e => throw new IllegalArgumentException(
            s"nearest_centroid: centroids must be a literal matrix, got $e")
        }
        NearestCentroid(children.head, m)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      MinhashBands.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"minhash_bands(shingles, k, bands) takes 3 arguments, got ${children.length}")
        def lit(i: Int): Int = children(i) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"minhash_bands: k/bands must be non-null literals, got $e")
        }
        MinhashBands(children.head, lit(1), lit(2))
      }))
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
      e match {
        case x if x.foldable && x.eval() != null =>
          x.eval().asInstanceOf[Number].intValue()
        case x => throw new IllegalArgumentException(
          s"$name must be a non-null literal, got $x")
      }
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      KmvSketchAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"kmv_sketch(col, k) takes 2 arguments, got ${children.length}")
        KmvSketchAgg(children.head, litInt(children(1), "kmv_sketch: k")).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_merge"),
      KmvMergeAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"kmv_merge(sketch, k) takes 2 arguments, got ${children.length}")
        KmvMergeAgg(children.head, litInt(children(1), "kmv_merge: k")).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      graft.functions.CmsSketchAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"cms_sketch(key, d, w) takes 3 arguments, got ${children.length}")
        graft.functions.CmsSketchAgg(children.head,
          litInt(children(1), "cms_sketch: d"),
          litInt(children(2), "cms_sketch: w")).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8d"),
      graft.functions.QuantizeInt8.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 1) throw new IllegalArgumentException(
          s"quantize_i8d(vec) takes 1 argument, got ${children.length}")
        graft.functions.QuantizeInt8(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("sample_sketch"),
      graft.functions.SampleSketchAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"sample_sketch(key, value, k) takes 3 arguments, got ${children.length}")
        graft.functions.SampleSketchAgg(children(0), children(1),
          litInt(children(2), "sample_sketch: k")).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("sample_merge"),
      graft.functions.SampleMergeAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"sample_merge(sketch, k) takes 2 arguments, got ${children.length}")
        graft.functions.SampleMergeAgg(children.head,
          litInt(children(1), "sample_merge: k")).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      BloomFilterAgg.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"bloom_agg(col, m_bits) takes 2 arguments, got ${children.length}")
        val m = children(1) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"bloom_agg: m_bits must be a non-null literal, got $e")
        }
        BloomFilterAgg(children.head, m).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      BloomMightContain.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"bloom_might_contain(key, words, m_bits) takes 3 arguments, got ${children.length}")
        val words = children(1) match {
          case e if e.foldable && e.eval() != null =>
            val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            IndexedSeq.tabulate(ad.numElements())(ad.getLong)
          case e => throw new IllegalArgumentException(
            s"bloom_might_contain: words must be a literal array, got $e")
        }
        BloomMightContain(children(0), words, litInt(children(2), "bloom_might_contain: m_bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_lut"),
      PqLut.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) throw new IllegalArgumentException(
          s"pq_lut(q, codebooks) takes 2 arguments, got ${children.length}")
        val m = children(1) match {
          case e if e.foldable && e.eval() != null =>
            val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            IndexedSeq.tabulate(ad.numElements()) { j =>
              val sub = ad.getArray(j)
              IndexedSeq.tabulate(sub.numElements()) { c =>
                val cw = sub.getArray(c)
                IndexedSeq.tabulate(cw.numElements())(cw.getDouble)
              }
            }
          case e => throw new IllegalArgumentException(
            s"pq_lut: codebooks must be a literal 3-level matrix, got $e")
        }
        PqLut(children.head, m)
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_sum"),
      PqAdcSum.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 3) throw new IllegalArgumentException(
          s"pq_adc_sum(packed, table, ksub) takes 3 arguments, got ${children.length}")
        val ksub = children(2) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"pq_adc_sum: ksub must be a non-null literal, got $e")
        }
        PqAdcSum(children(0), children(1), ksub)
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_score"),
      PqAdcScore.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 5) throw new IllegalArgumentException(
          s"pq_adc_score(packed, lut, q_norm, n2, ksub) takes 5 arguments, got ${children.length}")
        val n2 = children(3) match {
          case e if e.foldable && e.eval() != null =>
            val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            IndexedSeq.tabulate(ad.numElements())(ad.getDouble)
          case e => throw new IllegalArgumentException(
            s"pq_adc_score: n2 must be a literal array, got $e")
        }
        val ksub = children(4) match {
          case e if e.foldable && e.eval() != null =>
            e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(
            s"pq_adc_score: ksub must be a non-null literal, got $e")
        }
        PqAdcScore(children(0), children(1), children(2), n2, ksub)
      }))
    // whole-operator extension: native two-phase top-k-per-key
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKey.Strategy)
    // optimizer rewrite: row_number<=k filters take the native operator
    // engine-wide (kill switch: spark.graft.nativeTopK.enabled=false)
    ext.injectOptimizerRule(_ => new graft.plans.NativeTopKRule)
  }
}
