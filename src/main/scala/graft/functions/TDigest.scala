package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests", arXiv:1902.04023) — the north-star
  * quantile operator. The reference has no quantile counterpart (SURVEY.md
  * §2.6); built-in `percentile_approx` covers the v1 path, this sketch adds
  * what checkpointed validation needs: a FIXED-SIZE, ASSOCIATIVELY MERGEABLE
  * summary that can be stored per partition in the checkpoint table and
  * merged across partitions/runs without rescanning data.
  *
  * Implementation is the merging-digest variant: points/centroids accumulate
  * into slack capacity at the tail of the arrays; when full, centroids are
  * sorted by mean and swept into clusters whose weight is bounded by the k1
  * scale-function limit `4·W·q(1−q)/δ`. State is flat Double arrays + a
  * `used` counter so the Aggregator buffer is product-encodable (no kryo)
  * and row inserts are O(1) amortized (no per-row array copy).
  */
final case class TDigestBuf(
    compression: Double,
    means: Array[Double],
    weights: Array[Double],
    used: Int,
    min: Double,
    max: Double)

object TDigest {

  /** Buffered-centroid capacity before a compress pass (paper uses ~8δ). */
  private def capacity(compression: Double): Int =
    math.max(64, (8 * compression).toInt)

  def empty(compression: Double = 100.0): TDigestBuf = {
    val cap = capacity(compression)
    TDigestBuf(compression, new Array[Double](cap), new Array[Double](cap), 0,
      Double.PositiveInfinity, Double.NegativeInfinity)
  }

  /** Sort by mean and sweep into k1-bounded clusters. Output arrays are
    * restored to full capacity with the compacted centroids at the front.
    */
  def compress(b: TDigestBuf): TDigestBuf = {
    val n = b.used
    if (n == 0) return b
    val idx = Array.range(0, n).sortBy(b.means(_))
    var total = 0.0
    locally { var i = 0; while (i < n) { total += b.weights(i); i += 1 } }
    val cap = math.max(capacity(b.compression), n)
    val outM = new Array[Double](cap)
    val outW = new Array[Double](cap)
    // k1 scale function: k(q) = δ/2π · asin(2q−1). A cluster may not span
    // more than one k-unit, which caps centroid count at O(δ) while giving
    // tails singleton resolution (k' → ∞ at q→0,1).
    val kScale = b.compression / (2.0 * math.Pi)
    def kOf(q: Double): Double =
      kScale * math.asin(math.min(1.0, math.max(-1.0, 2.0 * q - 1.0)))
    var k = 0
    var curM = b.means(idx(0))
    var curW = b.weights(idx(0))
    var wSoFar = 0.0
    var kLeft = kOf(0.0)
    var i = 1
    while (i < n) {
      val m = b.means(idx(i)); val w = b.weights(idx(i))
      val qRight = (wSoFar + curW + w) / total
      if (kOf(qRight) - kLeft <= 1.0) {
        // weighted-mean merge into the current cluster
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM(k) = curM; outW(k) = curW; k += 1
        wSoFar += curW
        kLeft = kOf(wSoFar / total)
        curM = m; curW = w
      }
      i += 1
    }
    outM(k) = curM; outW(k) = curW; k += 1
    TDigestBuf(b.compression, outM, outW, k, b.min, b.max)
  }

  /** O(1) amortized insert: writes into slack capacity, compresses on fill.
    * Mutates the shared arrays — safe inside TypedImperativeAggregate, where
    * exactly one live buffer exists per aggregation group.
    */
  def add(b0: TDigestBuf, x: Double): TDigestBuf = {
    val b = if (b0.used >= b0.means.length) compress(b0) else b0
    b.means(b.used) = x
    b.weights(b.used) = 1.0
    val b2 = b.copy(used = b.used + 1,
      min = math.min(b.min, x), max = math.max(b.max, x))
    if (b2.used >= b2.means.length) compress(b2) else b2
  }

  /** Associative merge of two sketches (the treeAggregate combiner). */
  def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    if (a.used == 0) return b
    if (b.used == 0) return a
    val n = a.used + b.used
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(a.means, 0, m, 0, a.used)
    System.arraycopy(b.means, 0, m, a.used, b.used)
    System.arraycopy(a.weights, 0, w, 0, a.used)
    System.arraycopy(b.weights, 0, w, a.used, b.used)
    compress(TDigestBuf(math.max(a.compression, b.compression), m, w, n,
      math.min(a.min, b.min), math.max(a.max, b.max)))
  }

  /** Quantile estimate with centroid-midpoint linear interpolation. */
  def quantile(b0: TDigestBuf, q: Double): Double =
    quantileCompressed(compress(b0), q)

  /** [[quantile]] on an ALREADY-compressed buffer — lets multi-quantile
    * callers pay the O(n log n) compress exactly once instead of once per
    * requested quantile.
    */
  private def quantileCompressed(b: TDigestBuf, q: Double): Double = {
    val n = b.used
    if (n == 0) return Double.NaN
    if (n == 1) return b.means(0)
    var total = 0.0
    locally { var i = 0; while (i < n) { total += b.weights(i); i += 1 } }
    val target = q * total
    val firstMid = b.weights(0) / 2
    if (target <= firstMid)  // below the first centroid's midpoint → from min
      return b.min + (b.means(0) - b.min) *
        math.max(target, 0.0) / math.max(firstMid, 1e-12)
    var wSoFar = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = wSoFar + b.weights(i) / 2
      val nextMid = wSoFar + b.weights(i) + b.weights(i + 1) / 2
      if (target >= mid && target < nextMid) {
        val f = (target - mid) / (nextMid - mid)
        return b.means(i) + f * (b.means(i + 1) - b.means(i))
      }
      wSoFar += b.weights(i)
      i += 1
    }
    // above the last centroid's midpoint → interpolate to max
    val lastMid = wSoFar + b.weights(n - 1) / 2
    val f = (target - lastMid) / math.max(total - lastMid, 1e-12)
    b.means(n - 1) + math.min(math.max(f, 0.0), 1.0) * (b.max - b.means(n - 1))
  }

  def quantiles(b: TDigestBuf, qs: Seq[Double]): Seq[Double] = {
    val c = compress(b)
    qs.map(quantileCompressed(c, _))
  }

  /** Aggregator producing quantile estimates directly. Input is boxed so
    * NULLs are SKIPPED (SQL aggregate semantics) — a primitive Double input
    * encoder would silently fold nulls in as 0.0, skewing quantiles on
    * nullable columns (e.g. sr_hz/dur_ms nulled by the ingest try_cast).
    */
  final class QuantilesAgg(qs: Seq[Double], compression: Double)
      extends Aggregator[java.lang.Double, TDigestBuf, Seq[Double]] {
    def zero: TDigestBuf = empty(compression)
    def reduce(b: TDigestBuf, x: java.lang.Double): TDigestBuf =
      // null AND NaN skipped: one NaN would poison min/means and turn
      // every quantile into NaN
      if (x == null || x.doubleValue().isNaN) b else add(b, x.doubleValue())
    def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = TDigest.merge(a, b)
    def finish(b: TDigestBuf): Seq[Double] = quantiles(b, qs)
    def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Aggregator producing the sketch itself — storable in a checkpoint row
    * and mergeable later with [[merge]] without touching the data again.
    * Null-skipping, same as [[QuantilesAgg]].
    */
  final class SketchAgg(compression: Double)
      extends Aggregator[java.lang.Double, TDigestBuf, TDigestBuf] {
    def zero: TDigestBuf = empty(compression)
    def reduce(b: TDigestBuf, x: java.lang.Double): TDigestBuf =
      if (x == null || x.doubleValue().isNaN) b else add(b, x.doubleValue())
    def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = TDigest.merge(a, b)
    def finish(b: TDigestBuf): TDigestBuf = compress(b)
    def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
    def outputEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  }

  /** Column form: `tdigestQuantiles(col("x"), Seq(0.5, 0.95))`. */
  def tdigestQuantiles(c: Column, qs: Seq[Double],
                       compression: Double = 100.0): Column =
    udaf(new QuantilesAgg(qs, compression), Encoders.DOUBLE).apply(c)

  /** Column form returning the mergeable sketch struct. */
  def tdigestSketch(c: Column, compression: Double = 100.0): Column =
    udaf(new SketchAgg(compression), Encoders.DOUBLE).apply(c)
}
