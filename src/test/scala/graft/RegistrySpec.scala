package graft

/** Smoke gate: every registered query plans and executes at sf0.001;
  * entry returns rows; names/oracles stay consistent. */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys ⊆ query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Bench's attached set names real bench-flagged queries") {
    // a typo here would silently drop a query from the attached-mode
    // measurement instead of failing
    val benched = Registry.all.filter(_.bench).map(_.name).toSet
    assert(Bench.ArtifactBacked.subsetOf(benched),
      s"unknown/unbenched names: ${Bench.ArtifactBacked diff benched}")
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sf("sf0.001"))
      assert(df.count() >= 0)
    }
  }
}
