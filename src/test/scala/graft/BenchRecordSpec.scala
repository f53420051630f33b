package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's over-budget fallback line is the driver's artifact of
  * record when the full record outgrows the 2000-char tail capture
  * (round-2 artifact: parsed:null from a front-sliced line). Pin its
  * budget and structure so a malformed line can never silently return.
  */
class BenchRecordSpec extends AnyFunSuite {

  private val base =
    """{"metric":"total","value":80.370,"unit":"sec","sf":"/x"""" +
      ""","scaling":{"clips":600000,"efficiency":0.8102}"""

  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q_operator_name_number_$i%03d", i * 0.37))

  test("compact line stays within the tail budget and keeps the slowest") {
    val qs = queries(100) // full map would far exceed the budget
    val line = Bench.compactLine(base, qs)
    assert(line.length <= 1800)
    assert(line.startsWith(base + ","))
    assert(line.endsWith("}}"))
    assert(line.contains(""""queries_n":100"""))
    // slowest query leads the map
    assert(line.contains(""""queries_slowest":{"q_operator_name_number_100":37.00"""))
    // balanced braces + quotes — structurally parseable JSON
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(line.count(_ == '"') % 2 === 0)
    // entries are well-formed "name":number pairs
    val entryRe = """"q_[a-z_0-9]+":\d+\.\d\d""".r
    val entries = entryRe.findAllIn(line).size
    assert(entries > 30 && entries < 100) // partial, but substantial signal
  }

  test("compact line with few queries keeps them all, still valid") {
    val qs = queries(3)
    val line = Bench.compactLine(base, qs)
    assert(line.length <= 1800)
    assert(line.contains(""""queries_n":3"""))
    qs.foreach { case (k, _) => assert(line.contains("\"" + k + "\":")) }
    assert(line.count(_ == '{') === line.count(_ == '}'))
  }

  test("compact line with empty query list emits an empty map") {
    val line = Bench.compactLine(base, Nil)
    assert(line.endsWith(""""queries_slowest":{}}"""))
  }

  test("near-budget base drops the queries map instead of overflowing") {
    // base so large that even the queries_slowest opener would overflow:
    // the map must be dropped entirely (bare queries_n + close), keeping
    // the line inside the driver's tail window (round-3 ADVICE)
    val bigBase = """{"metric":"total","value":1.0,"pad":"""" + "x" * 1740 + "\""
    val line = Bench.compactLine(bigBase, queries(5))
    assert(line.length <= 1800, s"line length ${line.length}")
    assert(line.contains(""""queries_n":5"""))
    assert(!line.contains("queries_slowest"))
    assert(line.count(_ == '{') === line.count(_ == '}'))
  }
}
