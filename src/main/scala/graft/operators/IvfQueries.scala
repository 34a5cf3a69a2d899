package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** IVF (inverted-file) approximate nearest neighbor — the other classic
  * scale path next to the LSH variant: a k-means coarse quantizer assigns
  * every vector to a cell; a query probes its `nprobe` nearest cells and
  * searches only those inverted lists. The search shuffle is on cell id —
  * bucket-local, never all-pairs; the quantizer model is small and
  * broadcast as literals.
  *
  * Approximate by construction (centroid quality decides recall) →
  * rows-only check; output cardinality is pinned to the vector count via
  * the final left join.
  */
object IvfQueries {

  private val k = 16
  private val nprobe = 2

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val v = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val ml = v.withColumn("features", array_to_vector(col("v")))

    val model = new KMeans().setK(k).setSeed(11).setMaxIter(10)
      .setFeaturesCol("features").fit(ml)
    val assigned = model.transform(ml)
      .select(col("vec_id"), col("v"), col("nrm"),
        col("prediction").as("cell"))

    // distance to each centroid as literal-array expressions (the model is
    // tiny; the data never leaves its partition for assignment)
    val centroids = model.clusterCenters.map(_.toArray)
    val dist2 = (c: Array[Double]) => {
      val lc = typedLit(c.toSeq)
      aggregate(zip_with(col("v"), lc, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    }
    val probes = array(
      (0 until k).map(i => struct(dist2(centroids(i)).as("d"),
        lit(i).as("cell"))): _*)
    val probed = assigned.withColumn("probe",
        explode(slice(array_sort(probes), 1, nprobe)))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("probe.cell").as("cell"))

    val lists = assigned.select(col("cell"), col("vec_id").as("nn_id"),
      col("v").as("vb"), col("nrm").as("nrmb"))
    val cand = probed.join(lists, Seq("cell"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos",
        aggregate(zip_with(col("v"), col("vb"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("nrm") * col("nrmb")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    val nn = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("nn_id"), round(col("cos"), 6).as("cosine"))
    val perVec = cand.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_candidates"))
    assigned.select(col("vec_id"), col("cell").cast("long").as("cell"))
      .join(perVec, Seq("vec_id"), "left_outer")
      .join(nn, Seq("vec_id"), "left_outer")
      .na.fill(Map("n_candidates" -> 0L))
      .orderBy(col("vec_id"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("ann_ivf", annIvf _, None))
}
