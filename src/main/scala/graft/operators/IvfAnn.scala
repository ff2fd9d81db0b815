package graft.operators

import graft.queries.SimilarityQueries.cosineSim
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor (the builder prompt's "IVF or
  * LSH-bucketed variant as the scale path"; complements the
  * random-hyperplane LSH in v3 with the data-adaptive coarse-quantizer
  * family used by FAISS-like systems).
  *
  * Build: a KMeans coarse quantizer partitions the corpus into nCells
  * Voronoi cells (one distributed fit + one map-only assignment).
  * Search: each query scores the tiny centroid table (driver-collected,
  * nCells × dim — broadcast-sized by construction), probes its nProbe
  * closest cells, and exact-cosine re-ranks only the vectors in those
  * cells.
  *
  * Scale shape: candidate selection is an equi-join on `cell` — the
  * shuffle key cardinality is nCells and KMeans balances occupancy, so
  * there is no skew pile-up; per-query work drops from O(N) to
  * O(N · nProbe / nCells). At 100 TB you fit the quantizer on a sample
  * (KMeans converges on samples), keep nCells ~ √N so cells stay
  * executor-sized, and the assignment/search stay map-side + one join.
  */
object IvfAnn {

  /** Fit the coarse quantizer and assign every corpus vector to its
    * cell. Returns (assigned, centroids). */
  private def fitAssign(corpus: DataFrame, nCells: Int, seed: Long)
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    graft.plans.GraftExtensions.install(spark)
    val featured = corpus.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(featured)
    val assigned = model.transform(featured)
      .select(col("vec_id"), col("embedding"), col("cell"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
    (assigned, centroids)
  }

  /** nProbe closest cells per query, by the same metric as the re-rank. */
  private def probeCells(queries: DataFrame, centroids: DataFrame,
                         nProbe: Int): DataFrame =
    queries.crossJoin(broadcast(centroids))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(cosineSim(col("qe"), col("centroid")).desc, col("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))

  /** Candidate pairs before re-ranking: each query joined to the
    * vectors of its nProbe probed cells. Exposed so the pruning
    * property (candidates ≪ Q·N) is testable — the final top-k output
    * size says nothing about how much was scanned. */
  def candidates(corpus: DataFrame, queries: DataFrame,
                 nCells: Int, nProbe: Int, seed: Long = 42L): DataFrame = {
    val (assigned, centroids) = fitAssign(corpus, nCells, seed)
    assigned.join(probeCells(queries, centroids, nProbe), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
  }

  /** Persist the index: the assignment table laid out PARTITIONED BY
    * cell (so a probed search touches only nProbe directories) plus the
    * tiny centroid table. The operational shape at 100 TB: the quantizer
    * is fit once (on a sample), the corpus is assigned once, and every
    * subsequent query batch reads the standing index — no retraining,
    * no full-corpus scan. */
  def buildIndex(corpus: DataFrame, nCells: Int, path: String,
                 seed: Long = 42L): Unit = {
    val (assigned, centroids) = fitAssign(corpus, nCells, seed)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Top-k search against a persisted index. The probed cells arrive as
    * an isin filter on the partition column, so the scan prunes to the
    * probed directories (PartitionFilters — asserted in IvfAnnSpec). */
  def topKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val probes = probeCells(queries, centroids, nProbe)
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = spark.read.parquet(s"$path/assigned")
      .filter(col("cell").isin(cells: _*)) // static partition pruning
    assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              round(cosineSim(col("qe"), col("embedding")), 6).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Top-k cosine neighbors for each query via nProbe-of-nCells IVF.
    * corpus: (vec_id, embedding); queries: (query_id, qe). */
  def topK(corpus: DataFrame, queries: DataFrame,
           k: Int, nCells: Int, nProbe: Int, seed: Long = 42L): DataFrame =
    candidates(corpus, queries, nCells, nProbe, seed)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
              round(cosineSim(col("qe"), col("embedding")), 6).as("cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rnk") <= k)
}
