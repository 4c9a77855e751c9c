package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) over an
  * `array<float|double>` embedding column — the "train" step for the IVF
  * index (Similarity.ivfTopK takes the centroids).
  *
  * Bit-determinism under ANY partitioning: the per-cluster mean is
  * computed with the fixed-point trick — each component is scaled by 10^6
  * and rounded to a long, summed with `vec_sum` (associative integer
  * adds, so partial-aggregation order cannot change the result), divided
  * once at the end. Initial centroids are the k lowest-id vectors; same
  * inputs → same centroids on 1 core or 1000 executors.
  *
  * Per iteration: one broadcast of k centroids + one corpus scan + one
  * k-group aggregate — no driver-side data beyond the k×dim centroid
  * matrix.
  */
object KMeans {

  /** (cid, centroid) DataFrame from trained centroids — one definition so
    * fit/probe/assign cannot drift schemas.
    */
  private def centroidsDF(spark: org.apache.spark.sql.SparkSession,
                          centroids: Seq[(Int, Array[Double])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(centroids.map { case (cid, c) => Row(cid, c.toSeq) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false), nullable = false))))


  private val Scale = 1e6

  /** @return (cluster_id, centroid) rows, cluster_id = 0..k-1 */
  def fit(vectors: DataFrame, k: Int, iterations: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Array[Double])] = {
    val spark = vectors.sparkSession
    val corpus = vectors
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast("double")).as("v"))

    var centroids: Seq[(Int, Array[Double])] =
      corpus.orderBy(col("id").asc_nulls_first).limit(k).collect()
        .zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](1).toArray }.toSeq

    (1 to iterations).foreach { _ =>
      val cdf = centroidsDF(spark, centroids)
      // assign: nearest centroid by squared L2 (left-fold, deterministic;
      // ties → lowest cid)
      val assigned = LatestPerKey(
        corpus.crossJoin(broadcast(cdf))
          .withColumn("d2", aggregate(
            zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)),
            lit(0.0), _ + _)),
        Seq(col("id")),
        Seq(col("d2").asc_nulls_last, col("cid").asc_nulls_first))
      // recompute: fixed-point component sums via vec_sum → exact mean
      val sums = assigned
        .withColumn("vfp", expr(s"transform(v, x -> CAST(round(x * $Scale) AS BIGINT))"))
        .groupBy("cid")
        .agg(expr("vec_sum(vfp)").as("s"), count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        val cid = r.getInt(0)
        val s = r.getSeq[Long](1)
        val n = r.getLong(2)
        cid -> s.map(x => (x.toDouble / n) / Scale).toArray
      }.toMap
      // empty clusters keep their previous centroid
      centroids = centroids.map { case (cid, c) => cid -> updated.getOrElse(cid, c) }
    }
    centroids
  }

  /** Top-`nprobe` nearest centroids per vector (the IVF probe set),
    * ranked; keeps the vector column as `v`.
    */
  def probe(vectors: DataFrame, centroids: Seq[(Int, Array[Double])], nprobe: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val cdf = centroidsDF(spark, centroids)
    LatestPerKey.topKRanked(
      vectors.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
        .crossJoin(broadcast(cdf))
        .withColumn("d2", aggregate(
          zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _)),
      nprobe, Seq(col(idCol)),
      Seq(col("d2").asc_nulls_last, col("cid").asc_nulls_first))
      .select(col(idCol), col("v"), col("cid"))
  }

  /** Assign each vector to its nearest trained centroid. */
  def assign(vectors: DataFrame, centroids: Seq[(Int, Array[Double])],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val cdf = centroidsDF(spark, centroids)
    LatestPerKey(
      vectors.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
        .crossJoin(broadcast(cdf))
        .withColumn("d2", aggregate(
          zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _)),
      Seq(col(idCol)),
      Seq(col("d2").asc_nulls_last, col("cid").asc_nulls_first))
      .select(col(idCol), col("cid"), col("d2"))
  }
}
