package graft.ql

import org.scalatest.funsuite.AnyFunSuite

/**
 * Machine-ENFORCED golden-corpus audit: every case name under the
 * reference's `test/cases/&#42;/data/input` (measure 105 · stream 92 ·
 * trace 64 · topn 20 · property 10 = 291 input/want pairs) must appear
 * in EXECUTING code of the ql spec slab — a test title or assertion
 * line, not a comment — or carry a documented reason here. Test titles
 * compress variants with brace patterns ("float_top_{count,mean,sum}
 * .ql"), so matching expands them. The audit re-reads both sides from
 * disk at test time: a new upstream case or a deleted spec FAILS this
 * suite instead of silently eroding coverage.
 */
class GoldenAuditSpec extends AnyFunSuite {

  private val refRoot = new java.io.File("/root/reference/test/cases")
  private val specDir = new java.io.File("src/test/scala/graft/ql")
  private val families = Seq("measure", "stream", "trace", "topn", "property")

  /** names whose statements intentionally do NOT execute, each with why. */
  private val notPorted: Map[String, String] = Map(
    "gen_err_in_scalar" -> ("WantErr is a TYPED-REQUEST shape: BINARY_OP_IN " +
      "carrying a scalar instead of a strArray. The QL text parses to a " +
      "legal one-element list in both engines; the typed IR (Cond values: " +
      "Seq[Any]) cannot express a scalar-IN, so the malformed request is " +
      "unconstructible by design rather than validated at runtime."))

  private def inventory(fam: String): Set[String] = {
    val d = new java.io.File(refRoot, s"$fam/data/input")
    assert(d.isDirectory, s"reference inventory missing: $d")
    d.listFiles().map(_.getName.replaceAll("\\.[a-z]+$", "")).toSet
  }

  /** expand one level of {a,b,c} brace alternatives, recursively. */
  private def expand(s: String, cap: Int = 512): Seq[String] = {
    val m = "\\{([^{}]*)\\}".r.findFirstMatchIn(s)
    m match {
      case None => Seq(s)
      case Some(g) =>
        g.group(1).split(",", -1).toSeq
          .flatMap(alt => expand(s.substring(0, g.start) + alt + s.substring(g.end), cap))
          .take(cap)
    }
  }

  /** spec-source mentions from EXECUTING lines only (comments stripped). */
  private lazy val (mentioned, mentionedQl): (Set[String], Set[String]) = {
    val code = specDir.listFiles()
      .filter(f => f.getName.endsWith(".scala") && f.getName != "GoldenAuditSpec.scala")
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      .filterNot(l => l.trim.startsWith("//") || l.trim.startsWith("*"))
      .mkString("\n")
    val m = scala.collection.mutable.Set.empty[String]
    val q = scala.collection.mutable.Set.empty[String]
    "[A-Za-z0-9_.{},]+".r.findAllIn(code).toSet.foreach { t: String =>
      if (t.length <= 300) expand(t).foreach { e =>
        val e2 = e.stripPrefix(".").stripSuffix(".").stripSuffix(",")
        m += e2.stripSuffix(".ql").stripSuffix(".yaml")
        if (e2.contains(".ql")) q += e2
      }
    }
    (m.toSet, q.toSet)
  }

  /** multi-word names match bare; single-word names ("all", "top", "in")
    * would match any code, so they must appear with their .ql suffix. */
  private def executes(name: String): Boolean =
    if (name.contains("_")) mentioned(name)
    else mentionedQl(s"$name.ql")

  test("every reference golden case executes in the ql spec slab or is " +
      "documented here; executing count meets the ≥250 bar") {
    val all = families.flatMap(f => inventory(f).map(f -> _))
    assert(all.size >= 280, s"inventory shrank unexpectedly: ${all.size}")
    val (exec, missing) = all.partition { case (_, n) => executes(n) }
    val undocumented = missing.filterNot { case (_, n) => notPorted.contains(n) }
    assert(undocumented.isEmpty,
      s"golden cases neither executing nor documented: $undocumented")
    // documented entries must be real inventory names (no stale excuses)
    val stale = notPorted.keySet -- all.map(_._2).toSet
    assert(stale.isEmpty, s"notPorted entries not in the inventory: $stale")
    // and must not ALSO execute (an excuse for an executing case is stale)
    val shadowed = notPorted.keySet.filter(executes)
    assert(shadowed.isEmpty, s"notPorted entries that actually execute: $shadowed")
    info(s"golden corpus: ${exec.size}/${all.size} case pairs execute, " +
      s"${notPorted.size} documented non-ports")
    assert(exec.size >= 250, s"only ${exec.size} of ${all.size} execute")
  }
}
