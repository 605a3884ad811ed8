package graft.pipeline

import graft.SparkSpec
import graft.SparkEntry

/** Lint for the driver contract (builder prompt + GateQuery scaladoc):
  * the gate compares Spark output against DuckDB oracle output after
  * sorting COLUMNS BY NAME, so a single mis-aliased aggregate fails the
  * hash even when every value matches — historically the #1 gate
  * failure mode. This spec runs every gate query once at sf0.001 and
  * checks the contract invariants mechanically.
  */
class GateContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean =
    new java.io.File(sfDir + "/documents.parquet").exists()

  it should "use unique query names" in {
    val names = SparkEntry.gateQueries.map(_.name)
    names.distinct.length shouldBe names.length
  }

  it should "mention every Spark output column in the oracle SQL" in {
    assume(available, s"$sfDir not present")
    SparkEntry.gateQueries.foreach { q =>
      q.oracle.foreach { sql =>
        val cols = q.fn(spark, sfDir).columns
        val lower = sql.toLowerCase
        withClue(s"${q.name}: ") {
          cols.foreach { c =>
            withClue(s"column '$c' absent from oracle SQL: ") {
              lower should include(c.toLowerCase)
            }
          }
        }
      }
    }
  }

  it should "produce rows at the smoke scale factor for every gate" in {
    assume(available, s"$sfDir not present")
    SparkEntry.gateQueries.foreach { q =>
      withClue(s"${q.name}: ") {
        q.fn(spark, sfDir).limit(1).count() shouldBe 1L
      }
    }
  }

  it should "end every oracle in a total ORDER BY" in {
    // single-row global aggregates are deterministic without one; any
    // other exception must be added HERE deliberately
    val singleRow = Set("q19_countdistinct_multi", "q30_hash_sample")
    SparkEntry.gateQueries.filterNot(q => singleRow(q.name)).foreach { q =>
      q.oracle.foreach { sql =>
        withClue(s"${q.name}: ") {
          sql.toLowerCase should include("order by")
        }
      }
    }
  }

  it should "declare an oracle for every query or be a known replay-only op" in {
    // every gate currently ships a full DuckDB oracle; if a future
    // non-SQL-expressible op lands without one, it must be added HERE
    // deliberately, not silently
    val oracleless = SparkEntry.gateQueries.filter(_.oracle.isEmpty).map(_.name)
    oracleless shouldBe empty
  }

  it should "contain no unresolved interpolation artifacts in any oracle" in {
    // a shared oracle fragment edited from an s-string into a plain
    // string (or vice versa) leaves literal $identifier text in the
    // SQL — DuckDB parse error at driver time, invisible at compile
    // time. JSONPath '$.field' is the one legitimate dollar.
    val leak = "\\$[A-Za-z_]".r
    SparkEntry.gateQueries.foreach { q =>
      q.oracle.foreach { sql =>
        withClue(s"${q.name}: ") {
          leak.findFirstIn(sql) shouldBe None
        }
      }
    }
  }
}
