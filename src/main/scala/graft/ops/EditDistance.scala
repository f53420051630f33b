package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join: all pairs with
  * levenshtein(a, b) ≤ k — typo-tolerant entity resolution / near-dup
  * detection where token-set measures (minhash Jaccard, [[Dedup]]) are
  * blind to character-level edits.
  *
  * A brute self-join is O(n²) string comparisons. Segment blocking
  * instead (the pigeonhole scheme of PassJoin — Li, Deng & Feng,
  * VLDB 2011, a published public algorithm):
  *
  *  - **Index side**: every string of length ≥ k+1 is split into k+1
  *    contiguous segments (even partition, longer segments first). If
  *    ed(a,b) ≤ k then a CONTAINS at least one of b's segments verbatim,
  *    at a position within ±k of its home position — k edits cannot
  *    disturb all k+1 segments.
  *  - **Probe side**: every string emits, for each candidate partner
  *    length l within ±k of its own and each segment slot of the
  *    length-l layout, the substrings at the allowed positions.
  *  - Equi-join on (segment text, slot, l) → candidate id pairs →
  *    distinct → ONE exact levenshtein verification per candidate.
  *
  * Emission fan-out is constant: ≤ (2k+1)·(k+1)·(2k+1) keys per row
  * (75 at k=2) — linear scan, shuffle of short segment keys only, and
  * the verify step touches candidates, never the cross product. Recall is
  * COMPLETE (the pigeonhole bound is a theorem, not a heuristic): pairs
  * where both strings are shorter than k+1 characters — where no
  * segmentation exists — fall into one shared short-string block and are
  * verified brute within it.
  */
object EditDistance {

  /** Even k+1-way partition layout of a length-l string: (start, len) per
    * slot, longer segments first (l mod (k+1) leading segments get +1).
    */
  private[graft] def layout(l: Int, k: Int): Array[(Int, Int)] = {
    val parts = k + 1
    val base = l / parts
    val extra = l % parts
    val out = new Array[(Int, Int)](parts)
    var start = 0
    var i = 0
    while (i < parts) {
      val len = base + (if (i < extra) 1 else 0)
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  private[ops] def indexKeys(s: String, k: Int): Seq[(String, Int, Int)] = {
    val l = s.length
    if (l <= k) Seq(("#SHORT", -1, 0))
    else layout(l, k).zipWithIndex.map { case ((st, sl), i) =>
      (s.substring(st, st + sl), i, l)
    }.toSeq
  }

  private[ops] def probeKeys(s: String, k: Int): Seq[(String, Int, Int)] = {
    val la = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    if (la <= k) out += (("#SHORT", -1, 0))
    var l = math.max(k + 1, la - k)
    while (l <= la + k) {
      val slots = layout(l, k)
      var i = 0
      while (i < slots.length) {
        val (st, sl) = slots(i)
        var p = math.max(0, st - k)
        val pMax = math.min(la - sl, st + k)
        while (p <= pMax) {
          out += ((s.substring(p, p + sl), i, l))
          p += 1
        }
        i += 1
      }
      l += 1
    }
    out.distinct.toSeq
  }

  /** All unordered pairs (id_a < id_b) with levenshtein ≤ k over `strCol`:
    * (id_a, id_b, dist). The id column must be numeric (cast to long).
    */
  def selfJoinPairs(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull)
    val idxUdf = udf((s: String) => indexKeys(s, k))
    val prbUdf = udf((s: String) => probeKeys(s, k))
    val idx = base.select(col("id").as("id_i"), explode(idxUdf(col("s"))).as("e"))
      .select(col("id_i"), col("e._1").as("seg"), col("e._2").as("slot"), col("e._3").as("len"))
    val prb = base.select(col("id").as("id_p"), explode(prbUdf(col("s"))).as("e"))
      .select(col("id_p"), col("e._1").as("seg"), col("e._2").as("slot"), col("e._3").as("len"))
    val cand = prb.join(idx, Seq("seg", "slot", "len"))
      .filter(col("id_p") =!= col("id_i"))
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("s").as("__sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
