package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency lints for [[SparkEntry]]. Scala `Map` literals
  * silently keep the LAST duplicate key, so a query name registered
  * twice shadows one implementation with the other and every gate
  * stays green against the wrong code — exactly the trap a redundant
  * `doc_chunks` fell into in round 10. These lints read the SOURCE,
  * where the duplicate is still visible.
  */
class EntrySpec extends AnyFunSuite {

  private lazy val source: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/SparkEntry.scala")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("every oracle names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no query name is registered twice (map literals shadow silently)") {
    // a name legitimately appears twice in the source: once in
    // `queries`, once in `oracleSql`. Three or more means a duplicate
    // key collapsed inside one of the maps.
    val keyPattern = """"([a-z0-9_]+)"\s*->""".r
    val counts = keyPattern.findAllMatchIn(source)
      .map(_.group(1)).toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    val dups = counts.filter { case (k, n) =>
      n > 2 && SparkEntry.queries.contains(k)
    }
    assert(dups.isEmpty,
      s"query names registered more than queries+oracle once: $dups")
  }

  test("rows-only queries (no oracle) are a deliberate, named set") {
    val noOracle = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    // every query is expected to carry an oracle; a new rows-only
    // query must be added here EXPLICITLY with a reason
    val allowed = Set.empty[String]
    assert(noOracle == allowed,
      s"queries without oracles (driver falls back to rows-only): $noOracle")
  }
}
