package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's stdout contract against the driver's ~2000-char
  * tail capture: every emitted line stays well under the window, the
  * WHOLE footprint (all per-query part lines + the final total line)
  * fits in the tail at once, and every registered query's timing is
  * recoverable from the emitted text. Uses the real SparkEntry query
  * catalog so a new query that would overflow the tail fails here
  * before a round loses its bench.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val fake = names.zipWithIndex.map { case (n, i) =>
    n -> (i * 1.234 + 0.056)
  }
  private val sf = "/root/testdata/sf0.1"
  private val lines = BenchFormat.perQueryLines(fake)
  private val total = BenchFormat.totalLine(fake.map(_._2).sum, sf)

  test("compact qNN keys are unique across the whole catalog") {
    val keys = names.map(BenchFormat.compactKey)
    assert(keys.distinct.size == keys.size)
    assert(keys.forall(_.matches("q\\d+")),
      "every catalog entry must carry a qNN_ prefix")
  }

  test("every emitted line is <= 900 chars; the total line is short") {
    for (l <- lines) assert(l.length <= 900, s"line too long (${l.length}): $l")
    assert(total.length <= 150)
  }

  test("all part lines + total line fit the 2000-char driver tail together") {
    val footprint = (lines :+ total).map(_.length + 1).sum
    assert(footprint <= 1900,
      s"bench stdout footprint $footprint would overflow the driver tail — " +
        "shrink keys or drop precision before adding more queries")
  }

  test("every query's timing is regex-recoverable from the emitted lines") {
    val entry = """"(q\d+)":(\d+)""".r
    val got = lines.flatMap(l => entry.findAllMatchIn(l)
      .map(m => m.group(1) -> m.group(2).toLong)).toMap
    assert(got.keySet == names.map(BenchFormat.compactKey).toSet)
    for ((n, v) <- fake) // centiseconds, declared "unit":"cs" per line
      assert(math.abs(got(BenchFormat.compactKey(n)) - v * 100) <= 0.5 + 1e-9)
  }

  test("per-query lines declare the centisecond unit in the metric name") {
    for (l <- lines) assert(l.contains(""""metric":"per_query_cs""""), l)
  }

  test("every line is valid standalone JSON with the per_query_cs marker") {
    // no JSON lib on the unmanaged classpath — structural smoke checks
    for (l <- lines) {
      assert(l.startsWith("""{"metric":"per_query_cs","queries":{"""))
      assert(l.endsWith("}}"))
      assert(l.count(_ == '{') == l.count(_ == '}'))
    }
    assert(total.startsWith("""{"metric":"total","value":"""))
  }
}
