package graft

import scala.io.Source

/** Checked-in golden results at sf0.001: every contract query must keep
  * producing byte-identical collected output across refactors, without
  * DuckDB in the loop. Regenerate deliberately with `runMain graft.GoldenGen`
  * and review the diff. */
class GoldenSpec extends SparkSpec {

  private val golden: Map[String, (Int, String)] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/golden_sf0.001.tsv"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(n, c, h) = l.split("\t")
      n -> (c.toInt, h)
    }.toMap finally src.close()
  }

  test("golden file covers every contract query") {
    assert(golden.keySet == SparkEntry.queries.keySet)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name matches golden output") {
      val rows = fn(spark, sf).collect()
      val (expN, expH) = golden(name)
      assert(rows.length == expN, s"row count ${rows.length} != golden $expN")
      assert(GoldenGen.digest(rows) == expH, "content hash != golden")
    }
  }
}
