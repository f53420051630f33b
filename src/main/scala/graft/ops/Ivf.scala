package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the clustered
  * alternative to random-hyperplane LSH ([[Similarity]]): k centroids
  * learned from the data, every vector assigned to its nearest centroid,
  * queries probe only the `nprobe` centroids nearest to the query.
  *
  * Deterministic end to end: seed centroids are the vectors of the k ids
  * with the smallest xxhash64(id) (a deterministic pseudo-random sample —
  * no RNG state), refined by a fixed number of Lloyd iterations (each
  * iteration is a deterministic function of the data).
  *
  * Scale shape: assignment is one narrow map pass (tight-loop UDF over the
  * centroid matrix, broadcast via closure — k·dim doubles); the mean
  * recompute is a (centroid, dim)-keyed avg — a shuffle of n·dim skinny
  * rows, run `iters` times at INDEX BUILD time only. At serving scale the
  * assigned table is written `partitionBy("centroid_id")`, so a query scans
  * nprobe partitions (partition pruning), never the full table.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); i += 1 }
    dot / (norm(a) * norm(b))
  }

  /** Centroids pre-scaled to unit length: `argmax_c cos(v,c)` equals
    * `argmax_c dot(v, unit(c))` because |v| is constant across centroids —
    * so the per-(row, centroid) hot loop needs NO norms at all (the naive
    * form recomputed both norms n·k times).
    */
  private def unitized(cents: Array[Array[Double]]): Array[Array[Double]] =
    cents.map { c =>
      val n = norm(c)
      if (n == 0.0) c.clone() else c.map(_ / n)
    }

  private def nearest(v: Seq[Float], unitCents: Array[Array[Double]]): Int = {
    val vd = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { vd(i) = v(i).toDouble; i += 1 }
    var best = 0; var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < unitCents.length) {
      val cent = unitCents(c)
      var dot = 0.0
      var d = 0
      val n = math.min(vd.length, cent.length)
      while (d < n) { dot += vd(d) * cent(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Train k centroids with `iters` Lloyd refinements. Null embeddings are
    * excluded (they carry no position; the schema/completeness checks flag
    * them separately).
    */
  def train(dfRaw: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 2): Model = {
    val df = dfRaw.filter(col(vecCol).isNotNull)
    // deterministic seed sample: k rows with the smallest xxhash64(id)
    val seeds = df.select(col(idCol), col(vecCol))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h")).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    var model = Model(seeds)
    var it = 0
    while (it < iters) {
      val cents = unitized(model.centroids)
      val assignUdf = udf((v: Seq[Float]) => nearest(v, cents))
      // new centroid c = mean of its members, computed as a skinny
      // (centroid, dim)-keyed aggregate
      val means = df.select(assignUdf(col(vecCol)).as("__cid"),
          posexplode(col(vecCol)).as(Seq("__dim", "__v")))
        .groupBy(col("__cid"), col("__dim"))
        .agg(avg(col("__v")).as("__mean"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      val next = cents.indices.map { c =>
        byCid.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => cents(c) // empty cluster keeps its previous centroid
        }
      }.toArray
      model = Model(next)
      it += 1
    }
    model
  }

  /** Assign every vector to its nearest centroid (adds `centroid_id`;
    * null embedding → null centroid, so such rows fall out of every probe).
    */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val cents = unitized(model.centroids)
    val assignUdf = udf((v: Seq[Float]) =>
      if (v == null) Option.empty[Int] else Some(nearest(v, cents)))
    df.withColumn("centroid_id", assignUdf(col(vecCol)))
  }

  /** Top-k by cosine probing only the `nprobe` centroids nearest the query.
    * With nprobe == model.k this is exhaustive (exact brute-force parity —
    * the audit twin); smaller nprobe trades recall for a partition-pruned
    * scan.
    */
  def topK(assigned: DataFrame, idCol: String, vecCol: String,
           query: Seq[Float], model: Model, k: Int = 10,
           nprobe: Int = 4): DataFrame = {
    val qd = query.map(_.toDouble).toArray
    val probes = model.centroids.indices
      .sortBy(c => -cosine(qd, model.centroids(c)))
      .take(math.min(nprobe, model.k))
    // exact re-rank within the probed partitions — same ranking operator
    // as the brute-force audit twin (single source of tie-break semantics)
    Similarity.topK(assigned.filter(col("centroid_id").isin(probes: _*)),
      idCol, vecCol, query, k)
  }
}
