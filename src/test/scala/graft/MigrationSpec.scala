package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift gate for MIGRATION.md: the guide names dozens of query keys
  * and `HiveTables`/`HiveTypes`/`Det` entry points, and nothing else
  * stops it rotting as the registry evolves. Every backtick-quoted
  * claim is extracted and checked against the live code — deleting or
  * renaming a cited query or method breaks the build, which is the
  * whole point of shipping a migration guide next to an executable
  * catalogue. No SparkSession needed: the registry map and reflection
  * are both static.
  */
class MigrationSpec extends AnyFunSuite {

  private val text = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("MIGRATION.md")), "UTF-8")

  private val ticked: Seq[String] =
    "`([^`]+)`".r.findAllMatchIn(text).map(_.group(1)).toSeq

  /** Reference-side (dask) names the guide cites as the FROM column —
    * snake_case like our keys, but deliberately not in the registry. */
  private val referenceSide = Set("table_to_dask")

  test("every snake_case query key MIGRATION.md cites is a registry key") {
    val keys = SparkEntry.queries.keySet
    // a backticked lowercase snake_case token is a query-key claim;
    // camelCase (API methods), dotted paths, globs and code snippets
    // fall outside the pattern
    val claimed = ticked
      .filter(_.matches("[a-z][a-z0-9]*(_[a-z0-9]+)+"))
      .filterNot(referenceSide)
      .distinct
    assert(claimed.size >= 10,
      s"extraction broke — only found: $claimed")
    val missing = claimed.filterNot(keys)
    assert(missing.isEmpty,
      s"MIGRATION.md cites query keys absent from the registry: $missing")
  }

  test("every query-family glob MIGRATION.md cites matches at least " +
      "one registry key") {
    val keys = SparkEntry.queries.keySet
    val globs = ticked.filter(_.matches("[a-z][a-z0-9_]*\\*")).distinct
    assert(globs.nonEmpty, "extraction broke — no family globs found")
    val dead = globs.filterNot(g => keys.exists(_.startsWith(g.dropRight(1))))
    assert(dead.isEmpty,
      s"MIGRATION.md family globs matching no registry key: $dead")
  }

  test("every cited HiveTables/HiveTypes/Det entry point exists " +
      "(reflection over the companion objects)") {
    val cited = "(HiveTables|HiveTypes|Det)\\.([A-Za-z][A-Za-z0-9]*)".r
      .findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2))).toSeq.distinct
    assert(cited.size >= 5, s"extraction broke — only found: $cited")
    val bad = cited.filterNot { case (obj, m) =>
      Class.forName(s"graft.$obj$$").getMethods.exists(_.getName == m)
    }
    assert(bad.isEmpty,
      s"MIGRATION.md cites entry points that do not exist: $bad")
  }

  test("cited classes resolve (streaming surface)") {
    // the guide points streaming users at the typed-state module
    assert(text.contains("graft.streaming.Streaming"))
    Class.forName("graft.streaming.Streaming$")
  }
}
