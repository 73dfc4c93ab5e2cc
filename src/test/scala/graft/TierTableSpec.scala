package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-tier adjudication artifact: every gate in
  * SparkEntry.queries carries exactly one membership decision (an
  * x100 group, an sf1-only group, or an excluded group with its
  * one-line reason), so a new gate cannot land unadjudicated and
  * TIERS.md regenerates consistently. Pure set algebra — no Spark
  * session.
  */
class TierTableSpec extends AnyFunSuite {

  private val all = SparkEntry.queries.keys.toSet

  test("every gate is adjudicated: member of a tier XOR excluded-with-reason") {
    val unadjudicated = all.filter(q => BenchTiers.reason(q).isEmpty)
    assert(unadjudicated.isEmpty,
      s"gates without a tier adjudication: ${unadjudicated.toSeq.sorted.mkString(", ")}")
    val both = BenchTiers.sf1Head.intersect(BenchTiers.excluded)
    assert(both.isEmpty, s"gates both in a tier and excluded: $both")
  }

  test("tier sets reference only real gates (no typos, no ghosts)") {
    val ghosts = (BenchTiers.sf1Head ++ BenchTiers.excluded) -- all
    assert(ghosts.isEmpty, s"tier entries naming no gate: ${ghosts.toSeq.sorted}")
    assert(BenchTiers.x100Keep.subsetOf(BenchTiers.sf1Head))
  }

  test("no gate appears in two groups") {
    val groups = (BenchTiers.x100Groups ++ BenchTiers.sf1Groups ++
      BenchTiers.excludedGroups).flatMap(_._2.toSeq)
    val dupes = groups.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"gates adjudicated twice: ${dupes.toSeq.sorted}")
  }

  test("the committed TIERS.md matches the generated table") {
    val expected = BenchTiers.membershipTable(SparkEntry.queries.keys.toSeq)
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/TIERS.md")), "UTF-8")
    assert(onDisk == expected,
      "TIERS.md is stale — regenerate with `sbt \"runMain graft.TierTable\"`")
  }
}
