package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Static §4 audit enforcement (round 13): every src/main site that
  * rounds a sum/avg aggregate — the class every observed determinism
  * flake belonged to — must appear, with a classification, in
  * AUDIT_ROUND6.md's manifest. A new or edited site fails here until
  * it is re-audited (regenerate with tools/audit_round6.py, which
  * refuses to emit unclassified sites). Companion to PlanAuditSpec:
  * that one guards physical plans, this one guards rounding sites. */
class Round6AuditSpec extends AnyFunSuite {

  private val pattern =
    java.util.regex.Pattern.compile(
      """round\s*\(.*\b(sum|avg)\s*\(|\br6\s*\(.*\b(sum|avg)\s*\(""")

  private val classes =
    Set("GRID-EXACT", "INT-EXACT", "INT-RATIO", "GENERIC", "BOUNDED")

  private def collapse(s: String): String =
    s.trim.split("\\s+").mkString(" ")

  private def liveInventory(): Seq[(String, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)
      .flatMap { p =>
        val rel = root.relativize(p).toString
        java.nio.file.Files.readAllLines(p).asScala
          .filter(l => pattern.matcher(l).find())
          .map(l => (rel, collapse(l)))
      }
  }

  private def manifest(): Seq[(String, String, String)] = {
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("AUDIT_ROUND6.md")).asScala
    val fenced = lines
      .dropWhile(!_.startsWith("```")).drop(1)
      .takeWhile(!_.startsWith("```"))
    fenced.map { l =>
      val parts = l.split("\t", 3)
      assert(parts.length == 3, s"malformed manifest line: $l")
      (parts(0), parts(1), collapse(parts(2)))
    }.toSeq
  }

  test("every rounded-aggregate site is audited, with a known class") {
    val m = manifest()
    m.foreach { case (cls, f, _) =>
      assert(classes.contains(cls), s"unknown class $cls for $f") }
    val audited = m.map { case (_, f, l) => (f, l) }.sorted
    val live = liveInventory().sorted
    val missing = live.diff(audited)
    val stale = audited.diff(live)
    assert(missing.isEmpty && stale.isEmpty,
      s"""AUDIT_ROUND6.md out of date — regenerate with tools/audit_round6.py
         |unaudited new sites (${missing.size}):
         |${missing.take(10).map { case (f, l) => s"  $f: $l" }.mkString("\n")}
         |stale manifest entries (${stale.size}):
         |${stale.take(10).map { case (f, l) => s"  $f: $l" }.mkString("\n")}""".stripMargin)
  }

  test("the audit covers the known flake sites as converted (GRID-EXACT)") {
    val byClass = manifest().groupBy(_._1)
    val gridExact = byClass.getOrElse("GRID-EXACT", Seq()).map(_._2).toSet
    // the round-12/13 defect files must retain converted sites
    // (Mix.scala's waste_frac conversion removed its site from the
    // rounded-aggregate class entirely — integer DIV, no round())
    Seq("graft/relational/Relational.scala",
      "graft/relational/Analytics.scala").foreach { f =>
      assert(gridExact.contains(f), s"expected GRID-EXACT sites in $f")
    }
  }
}
