package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-artifact contract for the benchmark's stdout line: the driver
  * keeps only a 2,000-char stdout TAIL and json-parses the last line.
  * Round 6's enriched line hit 2,484 bytes and the driver graded NO bench
  * number at all (BENCH_r06 parsed: null). This spec assembles the compact
  * line with worst-case-width values for every field the real run can emit
  * and pins the budget with headroom.
  */
class BenchSpec extends AnyFunSuite {

  private def worstQueryMap(names: Seq[String]): String =
    names.map(n => "\"" + n + "\":99999.999").mkString("{", ",", "}")

  test("compact stdout line stays under the driver's 2000-char tail") {
    val qs = worstQueryMap(Bench.headlineNames)
    val cfgs = worstQueryMap(Seq(
      "medpub_sh3_sig200_r4", "medical_sh3_sig300_r3", "environment_sh4_sig300_r3"))
    val line = Bench.compactJson(
      total = 99999.99899999999, // an unformatted Double sum prints long
      qs = qs,
      totalMin3 = 99999.999,
      qsMin3 = qs,
      sfDir = "/root/testdata/sf0.1",
      cfgs = cfgs,
      cfgsMed = cfgs,
      scalingCore = Bench.scalingCoreSample(200000000L))
    assert(line.length <= 1800,
      s"compact bench line is ${line.length} chars (budget 1800, driver cap 2000):\n$line")
    // shape sanity: one line, brace-balanced
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("{") && line.endsWith("}"))
  }
}
